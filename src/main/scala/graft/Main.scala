package graft

import graft.pipeline.{Admission, LinkJob}
import org.apache.spark.sql.SparkSession

/** CLI for the dependency-link job (the reference's main() analogue —
  * main/.../ZipkinDependenciesJob.java:21-87, re-expressed as explicit flags
  * instead of env vars):
  *
  *   runMain graft.Main --day 2025-08-11 --in spans.jsonl --out /path/links \
  *     [--admission index-day|per-span-window|root-in-window] \
  *     [--strict-trace-id] [--master local[N]]
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    def req(k: String): String = opts.getOrElse(k,
      { System.err.println(s"missing required --$k\n$usage"); sys.exit(2) })

    val day = req("day")
    try java.time.LocalDate.parse(day)
    catch { case _: java.time.format.DateTimeParseException =>
      System.err.println(s"--day must be yyyy-MM-dd, got: $day"); sys.exit(2) }
    val admission = opts.getOrElse("admission", "index-day") match {
      case "index-day" => Admission.IndexDay
      case "per-span-window" => Admission.PerSpanWindow
      case "root-in-window" => Admission.RootInWindow
      case other =>
        System.err.println(s"unknown --admission $other (index-day|per-span-window|root-in-window)")
        sys.exit(2)
    }

    val spark = SparkSession.builder()
      .master(opts.getOrElse("master", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"))
      .appName("graft-link-job")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val links = LinkJob.runDay(spark, req("in"), req("out"), day, admission,
        strict = opts.contains("strict-trace-id"))
      val n = links.count()
      println(s"day=$day links=$n out=${req("out")}")
      links.orderBy("parent", "child").show(100, truncate = false)
    } finally spark.stop()
  }

  private val usage =
    "usage: graft.Main --day yyyy-MM-dd --in <spans path> --out <links path> " +
      "[--admission index-day|per-span-window|root-in-window] [--strict-trace-id] [--master local[N]]"

  private def parseArgs(args: Array[String]): Map[String, String] = {
    val flags = Set("strict-trace-id")
    @annotation.tailrec
    def go(rest: List[String], acc: Map[String, String]): Map[String, String] = rest match {
      case Nil => acc
      case k :: tail if k.startsWith("--") && flags(k.drop(2)) => go(tail, acc + (k.drop(2) -> "true"))
      case k :: v :: tail if k.startsWith("--") => go(tail, acc + (k.drop(2) -> v))
      case other :: _ =>
        System.err.println(s"unexpected argument: $other\n$usage"); sys.exit(2)
    }
    go(args.toList, Map.empty)
  }
}
