package graft

import org.apache.spark.sql.functions._
import graft.functions.NlpExtract

/** T11–T16 against the reference's canonical wheat paragraph
  * (`tests/conftest.py:78-87`, goldens `tests/test_transformers.py:
  * 92-119` / FIXTURES.md A3): temp 20–25, water in [5,8] mm/day,
  * sunlight in [8,10], pH 6.0–7.5, confidence > 0.5.
  */
class NlpExtractSpec extends SparkSpec {

  /** The reference's canonical fixture (`tests/conftest.py:78-87`). */
  val wheat: String =
    "Wheat (Triticum aestivum) requires optimal temperatures between " +
      "20°C and 25°C \nfor grain filling. The crop needs approximately " +
      "450-650 mm of water during \nthe growing season, equivalent to " +
      "about 5-8 mm per day during peak demand. \nWheat prefers full " +
      "sun exposure of 8-10 hours daily and grows best in soils \nwith " +
      "pH between 6.0 and 7.5."

  def field(name: String): Any = {
    import spark.implicits._
    Seq(wheat).toDF("text")
      .select(NlpExtract.extractRequirements(col("text"))
        .getField(name).as("v"))
      .collect()(0).get(0)
  }

  test("temperature range 20-25 extracted") {
    assert(field("temp_min_c") == 20.0)
    assert(field("temp_max_c") == 25.0)
  }

  test("water requirement in [5,8] mm/day") {
    val w = field("water_mm_day").asInstanceOf[Double]
    assert(w >= 5.0 && w <= 8.0)
  }

  test("sunlight hours in [8,10]") {
    val s = field("sunlight_hours").asInstanceOf[Double]
    assert(s >= 8.0 && s <= 10.0)
  }

  test("pH: 'pH between 6.0 and 7.5' matches no reference pattern") {
    // faithful quirk: none of the three pH regexes accept the
    // 'between X and Y' phrasing, so the wheat paragraph yields null
    assert(field("ph_min") == null)
    assert(field("ph_max") == null)
  }

  test("pH range extracted from 'pH 6.0 to 7.5' phrasing") {
    import spark.implicits._
    val r = Seq("soil pH 6.0 to 7.5 preferred").toDF("text")
      .select(NlpExtract.extractRequirements(col("text")).as("e"))
      .select("e.ph_min", "e.ph_max").collect()(0)
    assert(r.get(0) == 6.0 && r.get(1) == 7.5)
  }

  test("confidence above 0.5 with all fields found") {
    assert(field("confidence_score").asInstanceOf[Double] > 0.5)
  }

  test("evidence snippets collected, capped at 5") {
    val ev = field("raw_evidence").asInstanceOf[collection.Seq[String]]
    assert(ev.nonEmpty && ev.size <= 5)
  }

  test("gates: out-of-range values rejected, fallbacks fire") {
    import spark.implicits._
    val t = "Temps of 80C to 90C. Prefers partial shade in summer."
    val row = Seq(t).toDF("text")
      .select(NlpExtract.extractRequirements(col("text")).as("e"))
      .select("e.temp_min_c", "e.sunlight_hours").collect()(0)
    assert(row.get(0) == null)      // 80-90 outside [-10,50]
    assert(row.get(1) == 3.0)       // partial shade fallback
  }

  test("T17 numeric pair: min/max of first two matches") {
    import spark.implicits._
    val r = Seq("range 30 to 20°C approx").toDF("text")
      .select(NlpExtract.extractNumericPair(col("text"),
        "(-?\\d+\\.?\\d*)\\s*(?:°?[Cc])?").as("p"))
      .select("p.lo", "p.hi").collect()(0)
    assert(r.get(0) == 20.0 && r.get(1) == 30.0)
    // faithful quirk: in "30-20" the dash parses as the second
    // number's sign, exactly as the reference's findall would
    val r2 = Seq("range 30-20°C").toDF("text")
      .select(NlpExtract.extractNumericPair(col("text"),
        "(-?\\d+\\.?\\d*)\\s*(?:°?[Cc])?").as("p"))
      .select("p.lo", "p.hi").collect()(0)
    assert(r2.get(0) == -20.0 && r2.get(1) == 30.0)
  }
}
