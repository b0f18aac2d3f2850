package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document boilerplate removal: strip EVERY occurrence of a
  * segment (line, paragraph) whose document frequency within its group
  * — site, source domain, crawl host — exceeds a threshold. This is
  * the RefinedWeb/CCNet rule for navigation chrome, cookie banners and
  * footers (north-star extension — no counterpart in the reference,
  * SURVEY.md §2.8; rule shape per Penedo et al., "The RefinedWeb
  * Dataset for Falcon LLM", 2023, §3 line-wise filters).
  *
  * Distinct from [[graft.dedup.ChunkDedup]]/[[graft.dedup.SpanDedup]],
  * which KEEP the corpus-wide first occurrence of a repeated span:
  * here a segment most of a site shares is chrome, not content, so it
  * is removed from every document INCLUDING the first — and the rule
  * is group-scoped, so the same sentence on two docs of an unrelated
  * site survives.
  *
  * Scale shape (100 TB-safe):
  *  - one narrow split pass (codegen'd `split`/`posexplode`);
  *  - doc-frequency = one two-phase count-distinct aggregate keyed by
  *    (group, md5(segment)) — bounded key width however long segments
  *    get; hot segments partial-aggregate map-side;
  *  - group sizes = one aggregate over the input frame;
  *  - the boiler set joins back as a left-anti equi-join on
  *    (group, digest) — AQE broadcasts it in the usual case
  *    (boilerplate sets are tiny relative to the corpus);
  *  - reassembly shuffles once on the doc id.
  *  No collect, no all-pairs stage, no per-group single task.
  *
  * Contract: segments are `textCol` split on the LITERAL `delim`;
  * segments that are empty after trim never count toward document
  * frequency and are never removed (they are structure, not content).
  * A segment is boilerplate within its group iff it appears in
  * `>= minDocs` distinct documents AND in `> maxDocFrac` of the
  * group's documents (strictly greater, so `maxDocFrac = 1.0` disables
  * removal). Output is one row per input row:
  * (idCol, n_segments, n_kept, text_stripped) with surviving segments
  * rejoined by `delim` in original order; a document whose every
  * segment was boilerplate yields `n_kept = 0` and an empty string.
  */
object Boilerplate {

  def stripCommonSegments(df: DataFrame, idCol: String, textCol: String,
                          groupCol: String, maxDocFrac: Double,
                          minDocs: Int = 2,
                          delim: String = "\n"): DataFrame = {
    require(maxDocFrac >= 0.0 && maxDocFrac <= 1.0,
      "maxDocFrac must be in [0,1]")
    require(minDocs >= 1, "minDocs must be >= 1")
    val qdelim = java.util.regex.Pattern.quote(delim)

    val segs = df.select(col(idCol).as("__id"), col(groupCol).as("__g"),
        posexplode(split(col(textCol), qdelim)))
      .withColumnRenamed("pos", "__pos").withColumnRenamed("col", "__seg")
      .withColumn("__h", md5(col("__seg")))

    // group sizes over the INPUT frame: docs with no countable segment
    // still belong to the group and dilute every segment's fraction
    val sized = df.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__gdocs"))

    val dfreq = segs.filter(trim(col("__seg")) =!= "")
      .groupBy("__g", "__h")
      .agg(countDistinct(col("__id")).as("__docs"))
    val boiler = dfreq.join(sized, Seq("__g"))
      .filter(col("__docs") >= minDocs &&
        col("__docs") > col("__gdocs") * maxDocFrac)
      .select("__g", "__h")

    // trimmed-empty segments never enter `boiler` (filtered above), so
    // the anti-join keeps them without special-casing
    val kept = segs.join(boiler, Seq("__g", "__h"), "left_anti")
    val reassembled = kept.groupBy(col("__id"))
      .agg(count(lit(1)).cast("int").as("__n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__seg")))),
            x => x.getField("__seg")),
          delim).as("__stripped"))

    df.select(col(idCol),
        size(split(col(textCol), qdelim)).as("n_segments"))
      .join(reassembled, col(idCol) === col("__id"), "left")
      .select(col(idCol), col("n_segments"),
        coalesce(col("__n_kept"), lit(0)).as("n_kept"),
        coalesce(col("__stripped"), lit("")).as("text_stripped"))
  }
}
