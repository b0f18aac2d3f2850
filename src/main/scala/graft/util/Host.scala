package graft.util

/** Harness-main host/JSON helpers shared by Bench / ScaleBench /
  * Verify (the same main-dedup rationale as [[Sessions]]): one
  * definition of the contention stamp and of JSON string quoting, so
  * the three emitters can't drift apart on parsing details the round
  * driver depends on.
  */
object Host {

  /** (1m, 5m, 15m) load averages; empty when /proc is unavailable. */
  def loadavg(): Seq[Double] =
    try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
        java.nio.charset.StandardCharsets.UTF_8)
      .split("\\s+").take(3).toSeq.map(_.toDouble)
    catch { case _: Throwable => Nil }

  /** Minimal JSON string literal: quotes, backslashes and control
    * chars escaped — a path or SQL text interpolated raw would corrupt
    * the one stdout line the driver json.loads.
    */
  def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
