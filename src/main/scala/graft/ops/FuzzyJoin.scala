package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity join WITHOUT the cartesian
  * product (north-star extension — no counterpart in the reference;
  * the entity-resolution primitive of a dedup pipeline: "these two
  * titles/names are the same thing up to d typos").
  *
  * Scale shape — the inverted-index pattern the Jaccard dedup uses,
  * with a COMPLETENESS proof instead of a similarity threshold:
  *  1. each string explodes to its distinct positional q-grams (narrow,
  *     data-proportional);
  *  2. candidate pairs are an EQUI-JOIN on shared q-gram — never n²;
  *  3. pairs refine with `levenshtein(a, b) <= maxDist` (codegen'd).
  *
  * Count-filter completeness: one edit touches at most `q` of a
  * string's `|s| - q + 1` q-grams, so `ed(s,t) <= d` implies s and t
  * share at least `max(|s|,|t|) - q + 1 - q·d` q-grams — at least ONE
  * whenever `max(|s|,|t|) >= q·(d+1)`. Pairs where BOTH strings are
  * shorter than `q·(d+1)` may share no q-gram at distance <= d, so
  * short strings ALSO emit length-bucket block keys `#L<len-d..len+d>`
  * — two short strings within d length of each other always meet on a
  * bucket (tiny fan-out: 2d+1 extra keys on rare short rows). Net: the
  * candidate set provably contains every qualifying pair; the refine
  * step makes the result EXACTLY the cartesian semantics, which is how
  * the oracle checks it (brute-force DuckDB join ≡ this plan).
  *
  * Skew: a q-gram shared by f strings contributes f² candidate pairs —
  * the same Σdf² profile as the shingle index; for corpora with a
  * pathological hot gram, cap or salt as in
  * [[graft.dedup.Dedup.jaccardPairsCapped]] (completeness then degrades
  * to the capped contract).
  */
object FuzzyJoin {

  /** All pairs `(id_a, id_b, str_a, str_b, dist)` with `id_a < id_b`
    * and `levenshtein <= maxDist` within one table.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(q >= 1, "q must be >= 1")
    val c = col(strCol)
    val grams = array_distinct(
      transform(sequence(lit(1), greatest(length(c) - (q - 1), lit(1))),
        i => c.substr(i, lit(q))))
    val lenKeys =
      when(length(c) < q * (maxDist + 1),
        transform(
          sequence(greatest(length(c) - maxDist, lit(0)),
            length(c) + maxDist),
          l => concat(lit("#L"), l)))
        .otherwise(array().cast("array<string>"))
    val idx = df
      .select(col(idCol).as("__id"), c.as("__s"),
        explode(concat(grams, lenKeys)).as("__block"))
    val pairs = idx.as("a").join(idx.as("b"),
        col("a.__block") === col("b.__block") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__s").as("str_a"), col("b.__s").as("str_b"))
      .distinct()
    pairs
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= maxDist)
  }
}
