package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan-inspection / parity-triage harness (dev tooling, NOT
  * part of the engine surface — lives under src/test so non-test LoC
  * counts only engine code; run it via scripts/run_main.sh, whose
  * classpath includes test-classes). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    if (args.headOption.contains("sqlscan")) {
      // Triage for the SQL-parity sweep: which declared queries' DuckDB
      // oracle texts ALREADY run verbatim (or nearly) through spark.sql
      // over the registered views and match the DataFrame result?
      Tables.createViews(spark, d)
      val skip = args.drop(1).toSet
      SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
        if (!skip.contains(name)) {
          try {
            // second chance: DuckDB floor division `//` → Spark `div`
            // (identical for the non-negative operands these use)
            def run(s: String, tag: String): Unit = {
              val viaSql = spark.sql(s)
              val viaApi = SparkEntry.queries(name)(spark, d)
              if (viaApi.columns.toSeq != viaSql.columns.toSeq)
                println(s"COLS$tag $name")
              else {
                val a = viaApi.collect().map(_.toString).sorted
                val b = viaSql.collect().map(_.toString).sorted
                println(if (a.sameElements(b)) s"PASS$tag $name" else s"DIFF$tag $name")
              }
            }
            // replace only OUTSIDE single-quoted literals: a format
            // string or URL containing the needle must not be mangled
            def replaceOutside(s: String, from: String, to: String): String = {
              val out = new StringBuilder
              var i = 0; var q = false
              while (i < s.length) {
                if (s(i) == '\'') { q = !q; out += s(i); i += 1 }
                else if (!q && s.startsWith(from, i)) { out ++= to; i += from.length }
                else { out += s(i); i += 1 }
              }
              out.toString
            }
            // third chance: the full mechanical-rename chain (DuckDB →
            // Spark function names with identical semantics on these
            // inputs; strftime format literals mapped per-pattern —
            // literal mappings intentionally use plain replace)
            def translate(s: String): String = {
              val renamed = Seq(
                ("//", " div "),
                ("string_split_regex(", "split("),
                ("epoch_us(", "unix_micros("),
                ("quantile_cont(", "percentile("),
                ("strftime(", "date_format("),
              ).foldLeft(s) { case (acc, (f, t)) => replaceOutside(acc, f, t) }
              renamed
                .replace("'%Y-%m-%d'", "'yyyy-MM-dd'")
                .replace("'%Y%m%dT%H%M%S'", "'yyyyMMdd''T''HHmmss'")
            }
            val div = replaceOutside(sql, "//", " div ")
            val full = translate(sql)
            try run(sql, "  ")
            catch {
              // chance 2 only when the div rewrite actually changed
              // something; chance 3 only when it differs from chance 2
              case _: Throwable if div != sql =>
                try run(div, "2 ")
                catch { case _: Throwable if full != div => run(full, "3 ") }
              case _: Throwable if full != sql => run(full, "3 ")
            }
          } catch {
            case e: Throwable =>
              val m = Option(e.getMessage).getOrElse("").linesIterator
                .take(1).mkString.take(140)
              println(s"ERR   $name: $m")
          } finally spark.catalog.clearCache()
        }
      }
    } else if (args.headOption.contains("run")) {
      // run <sfDir> <outDir> <query...>: dump selected queries only
      // (graft.Verify always runs the full surface; targeted A/B work
      // on one rewritten operator shouldn't pay for 295)
      val sfDir = args(1)
      val outDir = args(2)
      for (name <- args.drop(3)) {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        spark.catalog.clearCache()
        println(s"[scratch] wrote $outDir/$name")
      }
    } else {
      for (name <- args) {
        println(s"===== $name =====")
        SparkEntry.queries(name)(spark, d).explain("formatted")
      }
    }
    spark.stop()
  }
}
