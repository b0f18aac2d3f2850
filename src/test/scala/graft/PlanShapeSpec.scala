package graft

import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowGroupLimitExec
import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.ops.{Joins, TxTable, Windows}

case class PlanFact(k: Long, v: String)
case class PlanDim(dk: Long, name: String)
case class PlanVec(vec_id: Long, embedding: Array[Float])

/** Physical-plan regression pins for the three load-bearing shapes the
  * round verdicts re-check by hand — a shape regression should fail CI
  * here, not wait for a judge's scale ladder:
  *
  *  1. [[Joins.bloomPrunedJoin]] evaluates the bloom predicate BELOW
  *     the fact side's exchange (the whole point: 99% of fact rows
  *     drop before shuffle bytes are paid);
  *  2. [[Windows.topOnePerGroup]] (the W1 operator) plans as
  *     WindowGroupLimit with a PARTIAL pass below the exchange (each
  *     map task forwards ≤ k rows per group, not whole groups);
  *  3. served IVF ([[Similarity.ivfTopKFromLists]]) carries NO
  *     aggregate stages — k-means training (Lloyd's groupBy/avg
  *     rounds) must never leak into a serve-time plan.
  *
  * Asserts run on `queryExecution.executedPlan` with AQE off for the
  * plan under test: `sparkPlan` predates EnsureRequirements (no
  * exchanges to anchor "below the exchange" on), and under AQE the
  * executed plan hides inside AdaptiveSparkPlanExec until runtime.
  * AQE rewraps stages but never moves a filter across an exchange or
  * introduces aggregates, so the non-adaptive plan is the right
  * deterministic shape to pin.
  */
class PlanShapeSpec extends SparkSpec {

  /** Build + inspect a plan with AQE disabled (restores the conf). */
  private def noAqe[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("bloomPrunedJoin: the bloom predicate filters below the fact exchange") {
    // the fact must come from FILES: ConvertToLocalRelation would fold
    // a filter over a local relation away entirely (which is also why
    // this shape matters — at scale the fact side IS a scan)
    val factDir = java.nio.file.Files.createTempDirectory("graft_planbloom")
      .toString + "/fact"
    df((1L to 500L).map(i => PlanFact(i % 50, s"v$i")))
      .write.parquet(factDir)
    val fact = spark.read.parquet(factDir)
    val dim = df((1L to 10L).map(i => PlanDim(i, s"d$i")))
    // force a shuffle join so "below the exchange" is observable:
    // disable auto-broadcast for this plan's threshold only
    val s = spark
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try noAqe {
      val joined = Joins.bloomPrunedJoin(fact, dim,
        factKey = "k", dimKey = "dk", expectedItems = 100L,
        numBits = 8192L)
      val plan = joined.queryExecution.executedPlan
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty, s"expected a shuffle join:\n$plan")
      def bloomBelow(p: SparkPlan): Boolean = p.collectFirst {
        case f: FilterExec
          if f.condition.toString.toLowerCase.contains("might_contain") => f
      }.isDefined
      assert(exchanges.exists(e => bloomBelow(e.child)),
        s"bloom predicate must evaluate below the fact exchange:\n$plan")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("topOnePerGroup (W1): WindowGroupLimit runs a Partial pass below the exchange") { noAqe {
    val rows = df((1L to 400L).map(i => PlanFact(i % 20, s"v$i")))
    val top = Windows.topOnePerGroup(rows, Seq("k"), Seq(col("v").desc))
    val plan = top.queryExecution.executedPlan
    val limits = plan.collect { case w: WindowGroupLimitExec => w }
    assert(limits.size >= 2,
      s"expected partial+final WindowGroupLimit stages:\n$plan")
    assert(limits.exists(_.mode.toString.contains("Partial")),
      s"the map-side pass must be Partial (pre-shuffle group limit):\n$plan")
    // and the partial stage sits below a shuffle: some exchange has a
    // WindowGroupLimit descendant
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.exists(e => e.child.collectFirst {
      case w: WindowGroupLimitExec => w
    }.isDefined), s"partial WindowGroupLimit must precede the exchange:\n$plan")
  } }

  test("as-of join (backward): ONE window pass, no range-condition join") { noAqe {
    // the load-bearing shape: union + one carry window — NOT a range
    // join (which plans as a nested-loop/cartesian and explodes at
    // scale). A second WindowExec creeping in doubles the sort+shuffle
    // cost of every as-of query.
    val trades = df((1L to 200L).map(i => PlanFact(i % 10, s"t$i")))
      .withColumn("ts", col("k") * 7 + length(col("v")))
      .select(col("k"), col("ts"), col("v"))
    val quotes = df((1L to 100L).map(i => PlanDim(i % 10, s"q$i")))
      .withColumn("ts", col("dk") * 5)
      .select(col("dk").as("k"), col("ts"), col("name").as("px"))
    val joined = graft.ops.AsofJoin.asof(trades, quotes, Seq("k"), "ts",
      valueCols = Seq("px"))
    val plan = joined.queryExecution.executedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size === 1,
      s"backward as-of must plan exactly ONE carry window:\n$plan")
    val loops = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(loops.isEmpty,
      s"as-of must never plan a range/nested-loop join:\n$plan")
  } }

  test("indexed span decontamination: the corpus scan meets a left-semi join before any explode") { noAqe {
    // the split that makes the suite's most expensive query affordable:
    // candidate docs (matched via the rare-token posting prune) go to
    // the window-explode path; every other corpus row takes a narrow
    // no-explode pass-through. If the semi join slips above the
    // Generate, the WHOLE corpus explodes k-token windows again.
    import graft.dedup.SpanDedup
    val s = spark
    import s.implicits._
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft_planspan").toString + "/corpus"
    (1L to 60L).map(i => (i, s"alpha beta gamma delta token$i epsilon"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val evalSet = Seq((900L, "gamma delta token7 epsilon zeta"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_planspani").toString + "/idx"
    graft.text.Bm25.buildIndex(corpus, "doc_id", "text", idx)
    val masked = SpanDedup.maskContaminatedSpansIndexed(corpus, evalSet,
      "doc_id", "text", windowTokens = 3, indexPath = idx)
    val plan = masked.queryExecution.executedPlan
    def scansCorpus(p: SparkPlan): Boolean = p.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("corpus")) => f
    }.isDefined
    def hasSemi(p: SparkPlan): Boolean = p.collectFirst {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.joinType.toString.contains("LeftSemi") &&
          scansCorpus(j.left) => j
    }.isDefined
    val corpusGenerates = plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec
        if scansCorpus(g) => g
    }
    assert(corpusGenerates.nonEmpty,
      s"expected the candidate branch to window-explode the corpus:\n$plan")
    assert(corpusGenerates.forall(g => hasSemi(g.child)),
      "every corpus explode must sit ABOVE the left-semi candidate " +
        s"split — non-candidates may never reach a Generate:\n$plan")
  } }

  test("served IVF: no Lloyd (aggregate) stages in the serve-time plan") { noAqe {
    val rnd = new scala.util.Random(41)
    val vecs = (0L until 30L).map(i =>
      PlanVec(i, Array.fill(8)(rnd.nextFloat() - 0.5f)))
    val corpus = df(vecs).toDF("vec_id", "embedding")
    val lists = java.nio.file.Files.createTempDirectory("graft_planivf")
      .toString + "/lists"
    val index = Similarity.buildIvfIndex(corpus, numLists = 3)
      .localCheckpoint()
    Similarity.writeIvfLists(corpus, index, lists)
    val served = Similarity.ivfTopKFromLists(spark, lists,
      corpus.filter(col("vec_id") < 2), k = 3, nprobe = 2, index)
    val plan = served.queryExecution.executedPlan
    val aggs = plan.collect { case a: BaseAggregateExec => a }
    assert(aggs.isEmpty,
      s"serve-time IVF must carry no aggregate (k-means) stages:\n$plan")
    // the corpus side comes from the persisted lists, not a re-assign:
    // exactly the TxTable's parquet scan plus the checkpointed index RDD
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.forall(_.metadata.get("Location")
        .exists(_.contains("lists"))),
      s"the only file scan must be the persisted lists table:\n$plan")
  } }
}
