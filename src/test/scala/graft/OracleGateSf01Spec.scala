package graft

import java.nio.file.{Files, Paths}
import scala.util.Try

/** Opt-in driver-scale gate: the IDENTICAL check_oracle.py
  * rows/schema/dtype/value-hash pass as [[OracleContractSpec]], but
  * at sf0.01 — the scale factor the per-round driver verdict actually
  * runs. The one failure class the standing sf0.001 gate cannot catch
  * is scale-dependent plan or parameter behavior (a broadcast
  * threshold crossed only at sf0.01, a COUNT(*)-gated oracle branch
  * that flips between the two corpora — e.g. the q241/q251/q256
  * auto-width gates and q255's trained codebook).
  *
  * Env-gated so routine `sbt test` time stays bounded (the sf0.01
  * dump is ~10× the sf0.001 one): set `SPARK_GRAFT_GATE_SF01=1` to
  * run — `SPARK_GRAFT_GATE_SF01=1 sbt "testOnly graft.OracleGateSf01Spec"` —
  * and do run it before every round gate.
  */
class OracleGateSf01Spec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("full value-hash parity with DuckDB at sf0.01 (opt-in)") {
    assume(sys.env.get("SPARK_GRAFT_GATE_SF01").contains("1"),
      "opt-in gate: set SPARK_GRAFT_GATE_SF01=1 to run at sf0.01")
    assume(Files.isDirectory(Paths.get(sfDir)),
      s"corpus $sfDir not present")
    assume(Try(Runtime.getRuntime.exec(
        Array("python3", "-c", "import duckdb, pandas, numpy"))
      .waitFor()).toOption.contains(0),
      "python3 + duckdb/pandas/numpy not available")
    val outDir = tmpDir("graft-verify-sf001gate")
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
      s"check_oracle.py sf0.01 gate failed:\n$report")
  }
}
