package graft

/** Round-over-round bench localizer: diff two per-query bench maps (the
  * files under `bench_history/`) and print the largest per-query time
  * deltas plus any shuffle/spill movements — so a drifting total names its
  * regressor instead of requiring a reviewer to eyeball 270+ plans.
  *
  * Usage: `runMain graft.BenchDiff bench_history/r12.json bench_history/latest.json [topN]`
  *
  * The files are the single-line JSON objects [[Bench]] writes; the
  * per-query map is a fixed machine-written shape
  * (`"name":{"sec":S,"shuffle_mb":M,"spill_mb":P}`), so a regex parse is
  * exact here — this tool must not pull a JSON library the build does not
  * have, and must keep working on partially-written files (best effort).
  */
object BenchDiff {
  private case class Q(sec: Double, shuffleMb: Double, spillMb: Double)

  private val entry =
    """"([^"]+)":\{"sec":(-?[0-9.]+),"shuffle_mb":(-?[0-9.]+),"spill_mb":(-?[0-9.]+)\}""".r

  private def load(path: String): Map[String, Q] =
    entry
      .findAllMatchIn(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))
      .map(m => m.group(1) -> Q(m.group(2).toDouble, m.group(3).toDouble, m.group(4).toDouble))
      .toMap

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchDiff <before.json> <after.json> [topN]")
    val before = load(args(0))
    val after = load(args(1))
    val topN = if (args.length >= 3) args(2).toInt else 10
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    val carried = after.keySet.intersect(before.keySet).toSeq
    val added = after.keySet.diff(before.keySet).toSeq.sorted
    val removed = before.keySet.diff(after.keySet).toSeq.sorted
    def tot(m: Map[String, Q], ks: Seq[String]) = ks.iterator.map(m(_).sec).filter(_ >= 0).sum

    println(s"carried=${carried.size} added=${added.size} removed=${removed.size}")
    println(s"carried total: ${f(tot(before, carried))}s -> ${f(tot(after, carried))}s")
    if (added.nonEmpty)
      println(s"added (${f(added.iterator.map(after(_).sec).filter(_ >= 0).sum)}s): ${added.mkString(", ")}")
    if (removed.nonEmpty) println(s"removed: ${removed.mkString(", ")}")

    println(s"top $topN time deltas (after - before, carried queries):")
    carried
      .map(k => (k, after(k).sec - before(k).sec))
      .sortBy { case (_, d) => -math.abs(d) }
      .take(topN)
      .foreach { case (k, d) =>
        val sh = after(k).shuffleMb - before(k).shuffleMb
        val shTxt = if (math.abs(sh) >= 0.5) s" shuffle ${f(before(k).shuffleMb)}->${f(after(k).shuffleMb)}MB" else ""
        println(f"  ${if (d >= 0) "+" else ""}${f(d)}%8s  $k (${f(before(k).sec)}s -> ${f(after(k).sec)}s)$shTxt")
      }

    val newSpill = carried.filter(k => after(k).spillMb > 0 && before(k).spillMb == 0)
    if (newSpill.nonEmpty)
      println(s"NEW SPILL: ${newSpill.map(k => s"$k=${f(after(k).spillMb)}MB").mkString(", ")}")
  }
}
