package graft

import java.nio.file.{Files, Paths}
import scala.util.Try

/** Standing oracle-contract gate: every `SparkEntry.oracleSql` entry
  * must (a) parse and execute in DuckDB, (b) emit no HUGEINT-family
  * output column (pandas materializes those as object/float64 while
  * Spark emits int64, so the driver's dtype-sensitive value hash
  * fails on numerically identical results — the q212 rounds-12/13
  * regression), and (c) return the same row count as the Spark side
  * at sf0.001.
  *
  * The DuckDB half runs through `tools/oracle_contract.py` (python3 +
  * duckdb are driver-side tooling, not library dependencies); the
  * whole suite cancels cleanly when that tooling or the corpus is
  * absent, so `sbt test` stays portable.
  */
class OracleContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val tool = "tools/oracle_contract.py"

  private def runDuck(): Option[Map[String, (Option[Long],
      List[String], Option[String])]] = {
    val oraclePath = Paths.get(tmpDir("graft-oracle"), "oracle_sql.json")
    Files.writeString(oraclePath, Verify.oracleJson(SparkEntry.oracleSql))
    val out = new StringBuilder
    val cmd = Seq("python3", tool, sfDir, oraclePath.toString)
    val code = Try {
      import scala.sys.process._
      cmd.!(ProcessLogger(line => out.append(line), _ => ()))
    }.getOrElse(-1)
    if (code != 0) return None
    // minimal JSON parse for the fixed {"name": {"rows": N,
    // "bad_types": [["c","T"],...]} | {"error": "..."}} shape
    val json = out.toString
    val entryRe =
      """"(q\d+[a-z0-9_]*)":\s*\{([^{}]*)\}""".r
    val rowsRe = """"rows":\s*(\d+)""".r
    val errRe = """"error":\s*"((?:[^"\\]|\\.)*)"""".r
    val badRe = """\["((?:[^"\\]|\\.)*)",\s*"((?:[^"\\]|\\.)*)"\]""".r
    Some(entryRe.findAllMatchIn(json).map { m =>
      val body = m.group(2)
      val rows = rowsRe.findFirstMatchIn(body).map(_.group(1).toLong)
      val err = errRe.findFirstMatchIn(body).map(_.group(1))
      val bad = badRe.findAllMatchIn(body)
        .map(b => s"${b.group(1)}:${b.group(2)}").toList
      m.group(1) -> ((rows, bad, err))
    }.toMap)
  }

  private lazy val duckSide = runDuck()

  private def requireHarness(): Map[String, (Option[Long],
      List[String], Option[String])] = {
    assume(Files.isDirectory(Paths.get(sfDir)),
      s"corpus $sfDir not present")
    assume(Files.exists(Paths.get(tool)),
      "oracle_contract.py not found (not running from repo root?)")
    assume(Try(Runtime.getRuntime.exec(
        Array("python3", "-c", "import duckdb")).waitFor())
      .toOption.contains(0), "python3 + duckdb not available")
    val d = duckSide
    assume(d.isDefined, "oracle_contract.py run failed")
    d.get
  }

  test("every oracle parses and executes in DuckDB") {
    val duck = requireHarness()
    val errors = duck.collect { case (n, (_, _, Some(e))) => s"$n: $e" }
    assert(errors.isEmpty, s"oracle SQL errors:\n${errors.mkString("\n")}")
    val missing = SparkEntry.oracleSql.keySet -- duck.keySet
    assert(missing.isEmpty, s"oracles not reported: $missing")
  }

  test("no oracle emits a HUGEINT-family output column") {
    val duck = requireHarness()
    val bad = duck.collect { case (n, (_, b, _)) if b.nonEmpty =>
      s"$n: ${b.mkString(", ")}" }
    assert(bad.isEmpty,
      "HUGEINT-family oracle outputs (cast them to BIGINT — pandas " +
        s"cannot dtype-match them):\n${bad.mkString("\n")}")
  }

  test("full value-hash parity with DuckDB at sf0.001 (driver gate)") {
    requireHarness() // same tooling preconditions (python3 + duckdb)
    assume(Try(Runtime.getRuntime.exec(
        Array("python3", "-c", "import pandas, numpy")).waitFor())
      .toOption.contains(0), "pandas/numpy not available")
    val outDir = tmpDir("graft-verify-sf0001")
    val failed = Verify.dump(spark, sfDir, outDir, _ => true)
    assert(failed.isEmpty, s"queries failed to execute: $failed")
    val out = new StringBuilder
    val code = Try {
      import scala.sys.process._
      Seq("python3", "tools/check_oracle.py", sfDir, outDir)
        .!(ProcessLogger(l => out.append(l).append('\n'),
          l => out.append(l).append('\n')))
    }.getOrElse(-1)
    val report = out.toString.linesIterator
      .filterNot(_.startsWith("PASS")).mkString("\n")
    assert(code == 0,
      s"check_oracle.py gate failed (rows/schema/dtype/hash):\n$report")
  }
}
