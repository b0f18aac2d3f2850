package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.pipeline._

/** Golden end-to-end medallion run over authored reference-shaped fixtures
  * (FIXTURES.md §A), exercising every edge case the reference implies:
  * null birthdate, a player missing from the season dim (left-join miss),
  * a long column straddling 2147483647, duplicate season rows, a team
  * whose `concat_ws` full name does not match, and a team/year join miss.
  */
class PipelineSpec extends SparkSpec {

  private lazy val lake: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lake").toString
    val s = spark
    import s.implicits._

    Seq(
      // Alice: 2 games; first carries the 2^31 boundary value
      (2023L, 1L, "G1", "Oct 24, 2023", "LAL vs BOS", "W", 38L, 12L, 20L, 30L, 10L, 5L, 2147483648L, "Alice", "p0", "p1"),
      (2023L, 1L, "G2", "Jan 05, 2024", "LAL @ DEN", "L", 35L, 8L, 15L, 20L, 8L, 7L, 1L, "Alice", "p0", "p1"),
      // Bob: in gamelogs but NOT in season -> left-join miss downstream
      (2023L, 2L, "G3", "Nov 01, 2023", "MIA vs NYK", "W", 30L, 6L, 11L, 15L, 4L, 3L, 0L, "Bob", "p0", "p1"))
      .toDF("season_id", "player_id", "game_id", "game_date", "matchup", "wl",
        "min", "fgm", "fga", "pts", "reb", "ast", "video_available",
        "player_name", "partition_0", "partition_1")
      .write.parquet(s"$dir/landing/ld_gamelogs.parquet")

    Seq(
      ("2023-10-24", "Los Angeles Lakers", "Q1", "Alice", "titular", "12:30", 5L, 8L, 2L, 12L, 4L, "p0", "p1"),
      ("2023-10-24", "Los Angeles Lakers", "Q2", "Alice", "titular", "11:45", 5L, 7L, 2L, 12L, 4L, "p0", "p1"),
      // Carol: team/year miss in J2 (team year is 2022) AND full-name miss in J3
      ("2023-05-10", "San Diego Surf", "Q1", "Carol", "suplente", "08:20", 3L, 6L, 1L, 7L, -2L, "p0", "p1"))
      .toDF("fecha", "equipo", "cuarto", "jugador", "titular", "minutos",
        "fg", "fga", "3p", "pts", "+/-", "partition_0", "partition_1")
      .write.parquet(s"$dir/landing/ld_games.parquet")

    Seq(
      // Alice appears TWICE verbatim -> A5 dedup must collapse
      (1L, "2023-24", 10L, "LAL", 30L, 70L, 2000L, "Alice", "Lakers", "Los Angeles", "F", "1988-12-30T00:00:00", "p0"),
      (1L, "2023-24", 10L, "LAL", 30L, 70L, 2000L, "Alice", "Lakers", "Los Angeles", "F", "1988-12-30T00:00:00", "p0"),
      // Carol: full name "San Diego Breakers" != games' "San Diego Surf" -> J3 miss
      (3L, "2023-24", 30L, "SDB", 25L, 50L, 800L, "Carol", "Breakers", "San Diego", "G", "1999-07-04T00:00:00", "p0"),
      // Dave: NULL birthdate -> P6 guard must pass null through
      (4L, "2023-24", 40L, "CHI", 28L, 60L, 900L, "Dave", "Bulls", "Chicago", "C", null, "p0"))
      .toDF("player_id", "season_id", "team_id", "team_abbreviation",
        "player_age", "gp", "pts", "player_name", "team_name_current",
        "team_city", "position", "birthdate", "partition_0")
      .write.parquet(s"$dir/landing/ld_season.parquet")

    Seq(
      ("Los Angeles Lakers", "LAL", 2023L, "Pacific", "Western", "p0"),
      ("San Diego Surf", "SDS", 2022L, "Pacific", "Western", "p0")) // wrong year
      .toDF("team", "nametag", "year", "division", "conference", "partition_0")
      .write.parquet(s"$dir/landing/ld_teams.parquet")

    Orchestrator.runAll(spark, dir)
    dir
  }

  test("bronze: downcast keeps the straddling column long, shrinks the rest") {
    val gl = Layers.read(spark, lake, "bronze", "gamelogs")
    assert(gl.schema("video_available").dataType == LongType)
    assert(gl.schema("pts").dataType == IntegerType)
    assert(gl.schema("min").dataType == IntegerType)
  }

  test("bronze: US dates canonicalized, season deduped, null birthdate survives") {
    val gl = Layers.read(spark, lake, "bronze", "gamelogs")
    assert(gl.filter(col("game_id") === "G1").select("game_date")
      .collect().head.getString(0) == "2023-10-24")
    val ss = Layers.read(spark, lake, "bronze", "season")
    assert(ss.count() == 3, "duplicate Alice rows collapse")
    assert(ss.filter(col("player_name") === "Dave")
      .select("birthdate").collect().head.isNullAt(0))
    assert(ss.filter(col("player_name") === "Alice").select("birthdate")
      .collect().head.getDate(0).toString == "1988-12-30")
  }

  test("bronze: MM:SS split produces int minute/second columns") {
    val g = Layers.read(spark, lake, "bronze", "games")
    assert(g.schema("minutes_played").dataType == IntegerType)
    val q1 = g.filter(col("jugador") === "Alice" && col("cuarto") === "Q1")
      .select("minutes_played", "seconds_played").collect().head
    assert(q1.getInt(0) == 12 && q1.getInt(1) == 30)
  }

  test("silver: J1 left-join miss keeps Bob with null bio") {
    val logs = Layers.read(spark, lake, "silver", "logs_gamesseason")
    assert(logs.count() == 3)
    val bob = logs.filter(col("player_name") === "Bob").collect().head
    assert(bob.isNullAt(logs.columns.indexOf("team_abbreviation")))
    assert(bob.isNullAt(logs.columns.indexOf("position")))
  }

  test("silver: J2 year-computed join and J3 concat_ws join miss for Carol") {
    val gst = Layers.read(spark, lake, "silver", "games_season_teams")
    val alice = gst.filter(col("player_name") === "Alice").collect()
    assert(alice.forall(_.getString(gst.columns.indexOf("nametag")) == "LAL"))
    assert(alice.forall(_.getString(gst.columns.indexOf("team_abbreviation")) == "LAL"))
    val carol = gst.filter(col("player_name") === "Carol").collect().head
    assert(carol.isNullAt(gst.columns.indexOf("nametag")), "2022 team year != 2023 game")
    assert(carol.isNullAt(gst.columns.indexOf("team_abbreviation")),
      "'San Diego Breakers' != 'San Diego Surf'")
  }

  test("silver: dynamic int-sum rollup discovers the stat columns at runtime") {
    val pg = Layers.read(spark, lake, "silver", "player_gamesscore")
    val alice = pg.filter(col("player_name") === "Alice").collect().head
    def v(c: String) = alice.getLong(pg.columns.indexOf(c))
    assert(v("minutes_played") == 23 && v("seconds_played") == 75)
    assert(v("minutes_to_seconds") == 1380)
    assert(v("points") == 24 && v("three_point_field_goals_made") == 4)
  }

  test("gold: player_resume matches hand-computed totals + latest team") {
    val pr = Layers.read(spark, lake, "gold", "player_resume")
    assert(pr.count() == 2)
    val cols = pr.columns
    val alice = pr.filter(col("player_name") === "Alice").collect().head
    assert(alice.getString(cols.indexOf("position")) == "F")
    assert(alice.getLong(cols.indexOf("total_points")) == 50)
    assert(alice.getLong(cols.indexOf("total_rebounds")) == 18)
    assert(alice.getLong(cols.indexOf("total_assists")) == 12)
    assert(alice.getDouble(cols.indexOf("total_seconds")) == 4380.0)
    assert(alice.getLong(cols.indexOf("games_played")) == 2)
    assert(alice.getString(cols.indexOf("latest_team")) == "LAL")
    val bob = pr.filter(col("player_name") === "Bob").collect().head
    assert(bob.getLong(cols.indexOf("total_points")) == 15)
    assert(bob.isNullAt(cols.indexOf("latest_team")) &&
      bob.isNullAt(cols.indexOf("position")))
  }

  test("gold: team_resume aggregates per enriched team") {
    val tr = Layers.read(spark, lake, "gold", "team_resume")
    val cols = tr.columns
    val lal = tr.filter(col("team_name") === "Los Angeles Lakers").collect().head
    assert(lal.getString(cols.indexOf("nametag")) == "LAL")
    assert(lal.getLong(cols.indexOf("total_points")) == 24)
    assert(lal.getLong(cols.indexOf("total_three_points_made")) == 4)
    assert(lal.getLong(cols.indexOf("total_plus_minus")) == 8)
    assert(lal.getLong(cols.indexOf("games_played")) == 1)
    val sd = tr.filter(col("team_name") === "San Diego Surf").collect().head
    assert(sd.isNullAt(cols.indexOf("nametag")))
    assert(sd.getLong(cols.indexOf("total_points")) == 7)
  }

  test("training-data pipeline: quality-filters, dedups exactly and nearly, annotates") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat is in the bag and it is the best of the cats today", "web"),
      (2L, "THE cat is in the bag  and it is the best of the cats today", "web"), // exact dup (case/ws)
      (3L, "the cat is in the bag and it is the best of the cats tonight", "web"), // near dup of 1
      (4L, "1234 !!! 42 ??", "web"), // no letters, no stopwords -> fails quality gate
      (5L, "el que la den los y en la que los den y el que la den", "crawl"))
      .toDF("doc_id", "text", "source")
    val out = graft.pipeline.TrainingData.run(docs,
      graft.pipeline.TrainingDataConfig(minQuality = 0.3, nearDup = true,
        minJaccard = 0.5))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 5L),
      "2 exact-dups into 1, 3 near-dups into 1, 4 quality-filtered; 1 and 5 survive")
    val row1 = out.filter(col("doc_id") === 1).collect().head
    assert(row1.getAs[String]("lang_pred") == "en")
    assert(row1.getAs[Int]("n_tokens") == 15)
    val rep = graft.pipeline.TrainingData.report(out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("en" -> 1L, "es" -> 1L))
  }

  test("every materialized table honors the single-file contract") {
    for ((layer, t) <- Seq("bronze" -> "gamelogs", "silver" -> "games_season_teams",
                           "gold" -> "player_resume")) {
      val files = new java.io.File(s"$lake/$layer/$t").listFiles().map(_.getName).toSeq
      assert(files == Seq(s"$t.parquet"), s"$layer/$t: $files")
    }
  }

  test("goldTx: gold marts published as TxTable commits match the single-file outputs") {
    import graft.ops.TxTable
    // a SECOND lake so the golden single-file run above stays untouched
    val lake2 = java.nio.file.Files.createTempDirectory("graft_lake_tx").toString
    for (t <- Seq("ld_gamelogs", "ld_games", "ld_season", "ld_teams")) {
      val src = s"$lake/landing/$t.parquet"
      spark.read.parquet(src).write.parquet(s"$lake2/landing/$t.parquet")
    }
    Orchestrator.runAll(spark, lake2, goldTx = true)
    for (t <- Seq("player_resume", "team_resume")) {
      assert(TxTable.versions(spark, s"$lake2/gold/$t") == Seq(1L),
        s"gold/$t must be one committed version")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq.toList).toSet
      assert(rows(TxTable.read(spark, s"$lake2/gold/$t")) ==
        rows(Layers.read(spark, lake, "gold", t)),
        s"tx-published gold/$t differs from the single-file publish")
      // refresh (stage re-run) commits v2; a pinned reader keeps v1
      if (t == "player_resume") SilverToGoldPlayer.run(spark, lake2, tx = true)
      else SilverToGoldTeam.run(spark, lake2, tx = true)
      assert(TxTable.versions(spark, s"$lake2/gold/$t") == Seq(1L, 2L))
      assert(rows(TxTable.readVersion(spark, s"$lake2/gold/$t", 1)) ==
        rows(TxTable.readVersion(spark, s"$lake2/gold/$t", 2)),
        "idempotent re-run: same content either version")
    }
  }
  test("publish refuses a plain overwrite onto a tx gold table") {
    val s2 = spark
    import s2.implicits._
    val lake2 = java.nio.file.Files.createTempDirectory("graft_mixed").toString
    val df = Seq((1L, "a")).toDF("id", "v")
    graft.pipeline.Layers.publish(df, lake2, "gold", "t", tx = true)
    // a non-tx refresh would rewrite the parquet UNDER the stale
    // manifest — TxTable readers would silently serve old data forever
    val e = intercept[RuntimeException](
      graft.pipeline.Layers.publish(df, lake2, "gold", "t", tx = false))
    assert(e.getMessage.contains("TxTable"))
  }

  test("a tx publish onto a single-file gold table removes the stale single file") {
    val s2 = spark
    import s2.implicits._
    val lake2 = java.nio.file.Files.createTempDirectory("graft_flip").toString
    graft.pipeline.Layers.publish(
      Seq((1L, "old")).toDF("id", "v"), lake2, "gold", "t", tx = false)
    val single = new java.io.File(s"$lake2/gold/t/t.parquet")
    assert(single.exists)
    // flip to tx: the manifest commit alone would leave the old single
    // file serving the pre-tx snapshot to single-file readers forever
    graft.pipeline.Layers.publish(
      Seq((2L, "new")).toDF("id", "v"), lake2, "gold", "t", tx = true)
    assert(!single.exists, "stale single-file snapshot must be removed")
    assert(graft.ops.TxTable.read(spark, s"$lake2/gold/t").collect()
      .map(_.getString(1)).toSeq === Seq("new"))
  }
}
