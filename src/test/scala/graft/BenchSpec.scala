package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards against the two silent-shrinkage failure modes of round 8:
  * queries breaking under fixture drift without any red signal, and the
  * bench publishing a crash's elapsed time as a legitimate score.
  */
class BenchSpec extends AnyFunSuite {

  /** Fixture-drift tripwire: force ANALYSIS of every registered query
    * against the current testdata. A regenerated fixture that changes a
    * column's type fails here loudly instead of silently dropping rows
    * from the driver's correctness artifact. (Eagerly-materializing
    * queries — CTAS, streaming — execute at sf0.001, which doubles as a
    * cheap end-to-end smoke for them.) */
  test("every SparkEntry query analyzes against current fixtures") {
    val spark = TestSpark.spark
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, TestSpark.sf).queryExecution.analyzed
        None
      } catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | "))
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis against current fixtures:\n" +
        failures.mkString("\n"))
  }

  test("bench measure records err for always-failing queries, clears it on success") {
    val queries = Map("ok" -> "ok", "broken" -> "broken", "flaky" -> "flaky")
    var flakyCalls = 0
    val (best, errs) = Bench.measure(queries, 2) { q =>
      if (q == "broken") throw new RuntimeException("boom \"quoted\"\nsecond line")
      if (q == "flaky") { flakyCalls += 1; if (flakyCalls == 1) throw new RuntimeException("once") }
    }
    assert(best.contains("ok"))
    assert(best.contains("flaky"), "a later-pass success must clear the error")
    assert(!errs.contains("flaky"))
    assert(!best.contains("broken"))
    assert(errs("broken").startsWith("RuntimeException: boom"))
    assert(!errs("broken").contains("\n"), "only the first message line is kept")
  }

  test("bench json marks failures as err and excludes them from the total") {
    val names = Seq("ok", "broken")
    val json = Bench.renderJson(names, Map("ok" -> 1.5),
      Map("broken" -> "RuntimeException: boom \"quoted\""), "/tmp/sf")
    assert(json.contains("\"broken\":\"err\""))
    assert(json.contains("\"ok\":1.5"))
    assert(json.contains("\"value\":1.5"), "total must exclude errored queries")
    assert(json.contains("\"n_err\":1"))
    assert(json.contains("\\\"quoted\\\""), "error messages must be JSON-escaped")
  }

  /** The driver keeps only a 2000-char stdout tail; the last line Bench
    * prints must be a COMPLETE JSON object inside that window with the
    * graded fields exact and any per-query omission declared. */
  test("compact bench line fits the tail budget, keeps errors, declares omissions") {
    val many = (1 to 200).map(i => f"query_with_a_long_name_$i%03d" -> i * 0.01).toMap
    val errs = Map("broken_query" -> "RuntimeException: boom")
    val line = Bench.renderCompact(many, errs, "/root/testdata/sf0.1")
    assert(line.length <= 1600, s"compact line ${line.length} chars exceeds budget")
    val om = """"queries_omitted":(\d+)""".r.findFirstMatchIn(line).get.group(1).toInt
    assert(om > 0, "200 queries cannot all fit; omission must be declared")
    assert(line.contains("\"broken_query\":\"err\""), "errors always survive compaction")
    assert(line.contains("\"n_err\":1"))
    assert(line.contains("\"query_with_a_long_name_200\":2.0"), "slowest query kept")
    assert(line.contains("\"queries_full\":\"target/bench.json\""))
    // structural sanity: braces balance and the object closes the line
    assert(line.count(_ == '{') == line.count(_ == '}') && line.endsWith("}"))

    // a small suite fits entirely: nothing omitted
    val small = Bench.renderCompact(Map("a" -> 1.0, "b" -> 2.0), Map.empty, "/tmp/sf")
    assert(small.contains("\"queries_omitted\":0"))
    assert(small.contains("\"a\":1.0") && small.contains("\"b\":2.0"))
  }

  test("bench floor signatures: a rewritten query's floor resets, and ONLY its floor") {
    // merge semantics: signature mismatch resets that query alone
    val now = Map("a" -> 2.0, "b" -> 2.0, "c" -> 2.0)
    val carry = Map("a" -> 1.0, "b" -> 1.0)
    val prevSigs = Map("a" -> "s1", "b" -> "s2")
    val sigs = Map("a" -> "s1", "b" -> "CHANGED", "c" -> "s3")
    assert(Bench.mergeFloors(now, carry, prevSigs, sigs) ===
      Map("a" -> 1.0, "b" -> 2.0, "c" -> 2.0))
    // records without signatures (legacy / sources unavailable) carry
    assert(Bench.mergeFloors(now, carry, Map.empty, sigs)("a") === 1.0)
    assert(Bench.mergeFloors(now, carry, prevSigs, Map.empty)("b") === 1.0)

    // the real repo's signatures: present, stable, METHOD-granular (two
    // queries implemented in the same file differ)
    val real = Bench.querySignatures()
    assert(real.contains("monthly_balance") && real.contains("mor_merge_prune"),
      s"expected signatures for registered queries, got ${real.size}")
    assert(real("mor_merge_prune") !== real("cow_merge_keyscope"),
      "same-file queries must have distinct (method-level) signatures")
    assert(real === Bench.querySignatures(), "signatures must be deterministic")

    // sensitivity: in a synthetic source tree, editing ONE method's body
    // flips its caller's signature and no other
    val d = java.nio.file.Files.createTempDirectory("graft_sig")
    def write(name: String, text: String): Unit =
      java.nio.file.Files.writeString(d.resolve(name), text)
    val entry =
      """object SparkEntry {
        |  def queries = Map(
        |    "q1" -> ((s, x) => Impl.one(s, x)),
        |    "q2" -> ((s, x) => Impl.two(s, x)))
        |  def oracleSql = Map.empty
        |}""".stripMargin
    def impl(twoBody: String) =
      s"""object Impl {
         |  def one(s: Any, x: Any) = 1
         |  def two(s: Any, x: Any) = $twoBody
         |}""".stripMargin
    write("SparkEntry.scala", entry); write("Impl.scala", impl("2"))
    val s1 = Bench.querySignatures(d.toString)
    write("Impl.scala", impl("2 + 40"))
    val s2 = Bench.querySignatures(d.toString)
    assert(s1("q1") === s2("q1"), "an untouched method's caller keeps its signature")
    assert(s1("q2") !== s2("q2"), "the edited method's caller must re-sign")
  }
}
