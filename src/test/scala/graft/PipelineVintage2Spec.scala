package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.pipeline._

/** Second golden fixture season (2024-25) for the medallion pipeline —
  * the round-10 goldens pin ONE input shape per stage; this vintage
  * pins the edges the first one can't reach:
  *
  *  - J2's computed year key resolved PER GAME against TWO vintages of
  *    the same team name (a Dec-31 game joins the 2024 dim row, a
  *    Jan-02 game the 2025 row — the year-straddle the reference's
  *    season layout implies but its fixtures never exercise),
  *  - the downcast's LOWER int boundary (−2^31 − 1 must keep the
  *    column long; the first golden only straddles the upper bound),
  *  - leading-zero "MM:SS" values ("07:05" → ints 7/5),
  *  - a second full Orchestrator run on a fresh lake (golden matrix
  *    ×2 — every stage re-derived from scratch, nothing cached).
  */
class PipelineVintage2Spec extends SparkSpec {

  private lazy val lake: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lake_v2").toString
    val s = spark
    import s.implicits._

    Seq(
      // Eve: one game each side of the year boundary; G10 carries the
      // LOWER int straddle (−2^31 − 1)
      (2024L, 5L, "G10", "Dec 31, 2024", "BOS vs NYK", "W", 30L, 7L, 14L, 20L, 5L, 3L, -2147483649L, "Eve", "p0", "p1"),
      (2024L, 5L, "G11", "Jan 02, 2025", "BOS @ MIA", "L", 25L, 4L, 9L, 10L, 2L, 1L, 1L, "Eve", "p0", "p1"),
      (2024L, 6L, "G12", "Feb 14, 2025", "GSW vs PHX", "W", 33L, 9L, 16L, 25L, 4L, 8L, 0L, "Frank", "p0", "p1"))
      .toDF("season_id", "player_id", "game_id", "game_date", "matchup", "wl",
        "min", "fgm", "fga", "pts", "reb", "ast", "video_available",
        "player_name", "partition_0", "partition_1")
      .write.parquet(s"$dir/landing/ld_gamelogs.parquet")

    Seq(
      ("2024-12-31", "Boston Celtics", "Q1", "Eve", "titular", "07:05", 3L, 6L, 1L, 8L, 4L, "p0", "p1"),
      ("2025-01-02", "Boston Celtics", "Q1", "Eve", "suplente", "10:00", 2L, 5L, 0L, 4L, -3L, "p0", "p1"))
      .toDF("fecha", "equipo", "cuarto", "jugador", "titular", "minutos",
        "fg", "fga", "3p", "pts", "+/-", "partition_0", "partition_1")
      .write.parquet(s"$dir/landing/ld_games.parquet")

    Seq(
      (5L, "2024-25", 20L, "BOS", 27L, 60L, 1500L, "Eve", "Celtics", "Boston", "G", "1997-03-15T00:00:00", "p0"),
      (6L, "2024-25", 50L, "GSW", 30L, 55L, 1200L, "Frank", "Warriors", "Golden State", "F", "1994-01-20T00:00:00", "p0"))
      .toDF("player_id", "season_id", "team_id", "team_abbreviation",
        "player_age", "gp", "pts", "player_name", "team_name_current",
        "team_city", "position", "birthdate", "partition_0")
      .write.parquet(s"$dir/landing/ld_season.parquet")

    Seq(
      // the SAME team name in two year vintages with distinct nametags
      ("Boston Celtics", "BOS", 2024L, "Atlantic", "Eastern", "p0"),
      ("Boston Celtics", "BOS25", 2025L, "Atlantic", "Eastern", "p0"))
      .toDF("team", "nametag", "year", "division", "conference", "partition_0")
      .write.parquet(s"$dir/landing/ld_teams.parquet")

    Orchestrator.runAll(spark, dir)
    dir
  }

  test("bronze: the LOWER int boundary keeps the column long; leading-zero MM:SS") {
    val gl = Layers.read(spark, lake, "bronze", "gamelogs")
    assert(gl.schema("video_available").dataType == LongType,
      "-2147483649 is below Int.MinValue — must not downcast")
    assert(gl.schema("pts").dataType == IntegerType)
    val g = Layers.read(spark, lake, "bronze", "games")
    val q1 = g.filter(col("jugador") === "Eve" && col("fecha") === "2024-12-31")
      .select("minutes_played", "seconds_played").collect().head
    assert(q1.getInt(0) == 7 && q1.getInt(1) == 5)
  }

  test("silver: J2 joins each game to ITS year's team vintage") {
    val gst = Layers.read(spark, lake, "silver", "games_season_teams")
    val cols = gst.columns
    val dec = gst.filter(col("game_date") === "2024-12-31").collect().head
    val jan = gst.filter(col("game_date") === "2025-01-02").collect().head
    assert(dec.getString(cols.indexOf("nametag")) == "BOS",
      "Dec 31 2024 game must join the year=2024 dim row")
    assert(jan.getString(cols.indexOf("nametag")) == "BOS25",
      "Jan 02 2025 game must join the year=2025 dim row")
    // J3 (player + concat_ws full name) hits in BOTH vintages
    assert(dec.getString(cols.indexOf("team_abbreviation")) == "BOS")
    assert(jan.getString(cols.indexOf("team_abbreviation")) == "BOS")
  }

  test("gold: totals and latest_team span the year boundary") {
    val pr = Layers.read(spark, lake, "gold", "player_resume")
    val cols = pr.columns
    val eve = pr.filter(col("player_name") === "Eve").collect().head
    assert(eve.getLong(cols.indexOf("total_points")) == 30)
    assert(eve.getLong(cols.indexOf("games_played")) == 2)
    assert(eve.getString(cols.indexOf("latest_team")) == "BOS")
    val frank = pr.filter(col("player_name") === "Frank").collect().head
    assert(frank.getLong(cols.indexOf("total_points")) == 25)
    assert(frank.getString(cols.indexOf("latest_team")) == "GSW")
  }

  test("gold: team_resume keeps the two year vintages as distinct rows") {
    val tr = Layers.read(spark, lake, "gold", "team_resume")
    val cols = tr.columns
    val got = tr.collect()
      .map(r => r.getString(cols.indexOf("nametag")) ->
        ((r.getLong(cols.indexOf("total_points")),
          r.getLong(cols.indexOf("games_played"))))).toMap
    assert(got == Map("BOS" -> ((8L, 1L)), "BOS25" -> ((4L, 1L))))
  }
}
