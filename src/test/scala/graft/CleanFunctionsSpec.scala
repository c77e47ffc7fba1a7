package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CleanFunctions._

/** Golden values from the reference's own tests
  * (`tests/test_transformers.py:61-135`, FIXTURES.md A5) plus
  * range-closure properties checked as single vectorized jobs over a
  * dense value grid (including NaN/∞/null edges).
  */
class CleanFunctionsSpec extends SparkSpec {

  /** Dense grid of doubles in [lo, hi] plus edge cases, as one frame. */
  def grid(lo: Double, hi: Double): DataFrame = {
    import spark.implicits._
    val step = (hi - lo) / 2000
    spark.range(0, 2001)
      .select((lit(lo) + col("id") * step).as("x"))
      .unionByName(Seq(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity).toDF("x"))
  }

  /** Assert no row of `df` violates `inv` (single job). */
  def holds(df: DataFrame, v: Column => Column, inv: Column => Column): Unit =
    assert(df.select(v(col("x")).as("y"))
      .filter(!coalesce(inv(col("y")), lit(false))).count() == 0)

  test("F9 temperature: 77°F converts to 25.0°C") {
    assert(evalNum(77.0, cleanTemperature) == 25.0)
  }
  test("F9 temperature: in-range celsius passes with 1dp rounding") {
    assert(evalNum(21.46, cleanTemperature) == 21.5)
  }
  test("F9 temperature: absurd value nulls out") {
    assert(evalNum(500.0, cleanTemperature) == null)
    assert(evalNum(null, cleanTemperature) == null)
  }

  test("F8 pH: 65 rescales to 6.5; 6.5 passes; 150 nulls") {
    assert(evalNum(65.0, cleanPh) == 6.5)
    assert(evalNum(6.5, cleanPh) == 6.5)
    assert(evalNum(150.0, cleanPh) == null)
  }

  test("F11 water: 5.0 keeps; 0.5 cm converts to 5.0; 49 weekly to 7.0") {
    assert(evalNum(5.0, normalizeWater) == 5.0)
    assert(evalNum(0.5, normalizeWater) == 5.0)
    assert(evalNum(49.0, normalizeWater) == 7.0)
    assert(evalNum(1000.0, normalizeWater) == null)
  }

  test("rounding is banker's (HALF_EVEN), matching Python round") {
    // 6.125 sits exactly on the scale-2 boundary: Python round gives
    // 6.12 (to-even); Spark's default HALF_UP round would give 6.13
    assert(evalNum(6.125, cleanPh) == 6.12)
    assert(evalNum(6.135, cleanPh) == 6.14)
  }

  test("F7 percentage: 0-1 scale multiplies; over-100 nulls") {
    assert(evalNum(0.45, cleanPercentage) == 45.0)
    assert(evalNum(45.0, cleanPercentage) == 45.0)
    assert(evalNum(101.0, cleanPercentage) == null)
  }

  test("F6 numeric: NaN and infinities null out, rounds to 3") {
    assert(evalNum(Double.NaN, cleanNumeric) == null)
    assert(evalNum(Double.PositiveInfinity, cleanNumeric) == null)
    assert(evalNum(1.23456, cleanNumeric) == 1.235)
  }

  test("W1 location hash matches md5 of %.6f,%.6f") {
    val got = eval(locationHash(lit(41.878113), lit(-87.629799)))
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("41.878113,-87.629799".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got == expect)
  }

  test("F10 crop name: synonyms map, unknown title-cases, empty Unknown") {
    assert(evalStr("corn", standardizeCropName) == "Maize")
    assert(evalStr("ORYZA SATIVA", standardizeCropName) == "Rice")
    assert(evalStr("sweet sorghum", standardizeCropName) == "Sweet Sorghum")
    assert(evalStr("", standardizeCropName) == "Unknown")
    // python title() semantics: capitalize after ANY non-letter
    assert(evalStr("winter-wheat", standardizeCropName) == "Winter-Wheat")
  }

  test("F12 texture: golden classes (normalized variant)") {
    assert(eval(inferTexture(lit(3.0), lit(90.0), lit(7.0))) == "Sand")
    assert(eval(inferTexture(lit(45.0), lit(30.0), lit(25.0))) == "Clay")
    assert(eval(inferTexture(lit(20.0), lit(40.0), lit(40.0))) == "Loam")
    assert(eval(inferTexture(lit(0.0), lit(50.0), lit(50.0))) == null)
  }

  test("F4 swap: repaired max/min order correctly, null-safe") {
    assert(eval(repairedMax(lit(-5.0), lit(10.0))) == 10.0)
    assert(eval(repairedMin(lit(-5.0), lit(10.0))) == -5.0)
    assert(eval(repairedMax(lit(null).cast("double"), lit(10.0))) == null)
  }

  test("property: cleanPh output is null or within [0,14]") {
    holds(grid(-50, 300), cleanPh,
      y => y.isNull || y.between(0, 14))
  }

  test("property: normalizeWater output is null or within (0,50]") {
    holds(grid(-10, 500), normalizeWater,
      y => y.isNull || (y > 0 && y <= 50))
  }

  test("property: clamp is idempotent and closed over [lo,hi]") {
    holds(grid(-1000, 1000), c => clamp(c, 0, 100),
      y => isnan(y) || (y.between(0, 100) &&
        least(greatest(y, lit(0.0)), lit(100.0)) === y))
  }

  test("property: temperature clean output is null or within [-50,60]") {
    holds(grid(-200, 200), cleanTemperature,
      y => y.isNull || y.between(-50, 60))
  }
}
