package graft

import org.apache.spark.sql.functions._

/** Scratch micro-bench for the span-dedup window/digest pipeline —
  * times the stages of SpanDedup at sf0.1 to locate the hot one
  * (guide §1: measure before changing). Not part of the library API.
  */
object SpanMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.util.Sessions.local(graft.util.Sessions.cpus(
      Runtime.getRuntime.availableProcessors().toString))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[spanmicro] $name%-46s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val docs = graft.ops.Sources.table(spark, sfDir, "documents")
    noop(docs) // warm
    val k = 8
    val toks = graft.text.TextAnalysis.tokens(col("text"))
    val base = docs.select(col("doc_id"), toks.as("__toks"),
      size(toks).cast("int").as("n_tokens"))

    (1 to 2).foreach { rep =>
      println(s"-- rep $rep --")
      time("tokenize only")(noop(base))
      val wins = base.select(col("doc_id"),
        when(col("n_tokens") < k, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), col("n_tokens") - k),
            i => concat_ws(" ", slice(col("__toks"), i + 1, lit(k)))))
          .as("__wins"))
      time("windows (no explode)")(noop(wins))
      val occ = wins.select(col("doc_id"),
        posexplode(col("__wins")).as(Seq("__pos", "__w")))
      time("windows + posexplode")(noop(occ))
      val fp = occ.select(col("doc_id"), col("__pos"), md5(col("__w")).as("__fp"))
      time("windows + posexplode + md5")(noop(fp))
      val fpx = occ.select(col("doc_id"), col("__pos"),
        xxhash64(col("__w")).as("__fp"))
      time("windows + posexplode + xxhash64")(noop(fpx))
      // window fingerprints WITHOUT building the window string: hash the
      // slice array directly
      val winsArr = base.select(col("doc_id"),
        when(col("n_tokens") < k,
            array().cast("array<array<string>>"))
          .otherwise(transform(sequence(lit(0), col("n_tokens") - k),
            i => slice(col("__toks"), i + 1, lit(k)))).as("__wins"))
      val occArr = winsArr.select(col("doc_id"),
        posexplode(col("__wins")).as(Seq("__pos", "__wt")))
      time("arr windows + posexplode + md5(concat_ws)")(noop(
        occArr.select(col("doc_id"), col("__pos"),
          md5(concat_ws(" ", col("__wt"))).as("__fp"))))
      // full stripDuplicatedSpans for reference
      time("stripDuplicatedSpans full")(noop(
        graft.dedup.SpanDedup.stripDuplicatedSpans(docs, "doc_id", "text", k)))
      // first-wins election alone
      val firstWins = org.apache.spark.sql.expressions.Window
        .partitionBy("__fp").orderBy(col("doc_id").asc, col("__pos").asc)
      val dupStarts = fp
        .withColumn("__rn", row_number().over(firstWins))
        .filter(col("__rn") > 1)
        .select(col("doc_id"), col("__pos"))
      time("fp + first-wins election")(noop(dupStarts))
      val covered = dupStarts
        .select(col("doc_id"),
          explode(sequence(col("__pos"), col("__pos") + lit(k - 1))).as("__tp"))
        .distinct()
      time("election + coverage distinct")(noop(covered))

      // spread variants: bisect the full op with the parallel fan-out
      val baseS = base // base is built from docs; spread applied below
      val sBase = graft.util.Scale.spreadForFanOut(docs)
        .select(col("doc_id"), toks.as("__toks"),
          size(toks).cast("int").as("n_tokens"))
      val sWins = sBase.select(col("doc_id"),
        when(col("n_tokens") < k, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), col("n_tokens") - k),
            i => concat_ws(" ", slice(col("__toks"), i + 1, lit(k)))))
          .as("__wins"))
      val sFp = sWins.select(col("doc_id"),
          posexplode(col("__wins")).as(Seq("__pos", "__w")))
        .select(col("doc_id"), col("__pos"), md5(col("__w")).as("__fp"))
      time("S: windows+explode+md5")(noop(sFp))
      val sDup = sFp
        .withColumn("__rn", row_number().over(firstWins))
        .filter(col("__rn") > 1)
        .select(col("doc_id"), col("__pos"))
      time("S: election")(noop(sDup))
      val sCov = sDup.select(col("doc_id"),
          explode(sequence(col("__pos"), col("__pos") + lit(k - 1))).as("__tp"))
        .distinct()
      time("S: coverage")(noop(sCov))
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("__tp").asc)
      val sIsl = sCov
        .withColumn("__brk",
          when(col("__tp") - lag(col("__tp"), 1).over(byDoc) === 1, 0)
            .otherwise(1))
        .withColumn("__isl", sum(col("__brk")).over(
          byDoc.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
        .groupBy(col("doc_id"), col("__isl"))
        .agg(min(col("__tp")).as("s"), max(col("__tp")).as("e"))
        .groupBy("doc_id")
        .agg(array_sort(collect_list(struct(col("s"), col("e"))))
          .as("__spans"))
      time("S: islands")(noop(sIsl))
      val sJoin = sBase.join(sIsl, Seq("doc_id"), "left")
      time("S: join base+islands (no reassembly)")(noop(sJoin))
      time("S: full strip (orderBy omitted)")(noop(
        graft.dedup.SpanDedup.stripDuplicatedSpans(docs, "doc_id", "text", k)))
      time("S: full strip + orderBy")(noop(
        graft.dedup.SpanDedup.stripDuplicatedSpans(docs, "doc_id", "text", k)
          .orderBy("doc_id")))
    }
    spark.stop()
  }
}
