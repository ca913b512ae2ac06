package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Offset-serialization round-trip for the Kafka contract source's
  * checkpoint format (r18 ADVICE fix): offsets are JSON
  * `{"topic":{"partition":next}}` — the real `format("kafka")`
  * source's offset-log shape — because Kafka topic names may contain
  * the old delimiter-join format's `,`/`=`/`|` characters. */
class TpOffsetsSpec extends AnyFunSuite {

  private def roundTrip(m: Map[(String, Int), Long]): Unit = {
    val parsed = TpOffsets.parse(TpOffsets(m).json()).m
    assert(parsed == m, s"round-trip mangled: ${TpOffsets(m).json()}")
  }

  test("empty map round-trips") { roundTrip(Map.empty) }

  test("multi-topic multi-partition map round-trips sorted") {
    val m = Map(("beta", 1) -> 42L, ("alpha", 0) -> 7L,
      ("alpha", 2) -> 0L, ("beta", 0) -> 99L)
    assert(TpOffsets(m).json() ==
      """{"alpha":{"0":7,"2":0},"beta":{"0":99,"1":42}}""")
    roundTrip(m)
  }

  test("topic names with the old format's delimiters round-trip intact") {
    roundTrip(Map(("a,b=c|d", 0) -> 5L, ("x=y", 3) -> 11L,
      ("plain.topic-name_1", 7) -> 123456789L))
  }

  test("topic names with JSON metacharacters are escaped") {
    val m = Map(("""quote"back\slash""", 0) -> 1L)
    roundTrip(m)
  }

  test("legacy pre-r18 delimiter checkpoints still parse (restart resumes, not crashes)") {
    assert(TpOffsets.parse("events|0=42,events|1=7,logs|0=0").m ==
      Map(("events", 0) -> 42L, ("events", 1) -> 7L, ("logs", 0) -> 0L))
  }

  test("legacy checkpoint whose first topic starts with '{' resumes via parse fallback (r18 ADVICE)") {
    // the old format banned ,/=/| in topic names but never '{' — a
    // first-character sniff would feed this to the JSON parser and
    // crash the restart
    assert(TpOffsets.parse("{curly|0=42,events|2=7").m ==
      Map(("{curly", 0) -> 42L, ("events", 2) -> 7L))
  }

  test("malformed offset json is rejected, not misparsed") {
    intercept[Exception] { TpOffsets.parse("""{"t":[1,2]}""") }
    intercept[Exception] { TpOffsets.parse("""{"t":{"0":"x"}}""") }
  }
}
