package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec
import graft.functions.expressions.JsonScan

/** [[graft.functions.expressions.JsonLongField]] — the byte-scan
  * replacement for `get_json_object(j,'$.k').cast("long")` on
  * integer-number fields. Hand-picked adversarial inputs against the
  * documented semantics, a generated parity sweep against
  * get_json_object itself, and an end-to-end codegen run (the
  * nullable-override rule).
  */
class JsonLongFieldSpec extends SparkSpec {

  private def x(json: String, key: String = "k"): Any = {
    val r = JsonScan.extract(UTF8String.fromString(json),
      UTF8String.fromString(key))
    if (r == null) null else r.longValue()
  }

  test("plain extraction, whitespace, ordering, signs") {
    assert(x("""{"k": 21}""") == 21L)
    assert(x("""{"k":21}""") == 21L)
    assert(x("""  { "a" : 1 , "k" : -7 , "z" : 2 }  """) == -7L)
    assert(x("""{"k":0}""") == 0L)
    assert(x("""{"k":-0}""") == 0L)
    assert(x("""{"a":1,"b":2,"k":9223372036854775807}""") == Long.MaxValue)
    assert(x("""{"k":-9223372036854775808}""") == Long.MinValue)
  }

  test("absent / ill-typed / overflow fields are null") {
    assert(x("""{"a":1}""") == null)            // missing
    assert(x("""{}""") == null)                 // empty object
    assert(x("""{"k":1.5}""") == null)          // float
    assert(x("""{"k":1e3}""") == null)          // exponent
    assert(x("""{"k":"123"}""") == null)        // string (no coercion)
    assert(x("""{"k":true}""") == null)         // bool
    assert(x("""{"k":null}""") == null)         // JSON null
    assert(x("""{"k":{"a":1}}""") == null)      // object
    assert(x("""{"k":[1]}""") == null)          // array
    assert(x("""{"k":9223372036854775808}""") == null)  // > Long.Max
    assert(x("""{"k":-9223372036854775809}""") == null) // < Long.Min
    assert(x("""{"k":--1}""") == null)
    assert(x("""{"k":-}""") == null)
    assert(x("""{"k":12a}""") == null)          // trailing garbage
    // JSON-invalid shapes Jackson also rejects (review finding):
    assert(x("""{"k":007}""") == null)          // leading zeros
    assert(x("""{"k":0}""") == 0L)              // but a lone 0 is fine
    assert(x("""{"k":1 2}""") == null)          // second token
    assert(x("""{"k":1 }""") == 1L)             // ws then close is fine
    assert(x("""{"a":,"k":1}""") == null)       // empty skipped value
  }

  test("only TOP-LEVEL keys match — nested and string decoys don't") {
    // the key inside a nested object must not match
    assert(x("""{"a":{"k":99},"k":7}""") == 7L)
    assert(x("""{"a":{"k":99}}""") == null)
    // the key pattern inside a STRING VALUE must not match
    assert(x("""{"a":"\"k\":99","k":7}""") == 7L)
    assert(x("""{"a":"{\"k\":99}"}""") == null)
    // inside an array of objects
    assert(x("""{"a":[{"k":99},2],"k":7}""") == 7L)
    // key must match exactly — not prefix/suffix
    assert(x("""{"kk":99,"k":7}""", "k") == 7L)
    assert(x("""{"k":7}""", "kk") == null)
    // first occurrence wins on duplicates (Jackson streaming parity)
    assert(x("""{"k":1,"k":2}""") == 1L)
  }

  test("malformed / non-object input is null, never a throw") {
    assert(x("") == null)
    assert(x("   ") == null)
    assert(x("[1,2,3]") == null)               // array root
    assert(x("42") == null)                    // scalar root
    assert(x("""{"k":1""") == null)            // unterminated object
    assert(x("""{"k""") == null)               // unterminated key
    assert(x("""{"a" 1}""") == null)           // missing colon
    assert(x("""{k:1}""") == null)             // unquoted key
    assert(x("""{"a":"unterminated""") == null)
    assert(x("""{"a":\\""") == null)
  }

  test("escapes and multi-byte strings are skipped correctly") {
    assert(x("""{"a":"a\\","k":3}""") == 3L)       // escaped backslash
    assert(x("""{"a":"q\"x","k":3}""") == 3L)      // escaped quote
    assert(x("""{"a":"π≈3, é","k":3}""") == 3L) // multi-byte UTF-8
    assert(x("{\"a\":\"é中文\",\"k\":5}") == 5L)
  }

  test("generated parity with get_json_object(...).cast(long)") {
    // integer-valued corpora: the documented identical-semantics zone
    val rows = (0 until 2000).map { i =>
      val v = (i * 2654435761L) % 100003L - 50000L
      i % 5 match {
        case 0 => s"""{"k": $v}"""
        case 1 => s"""{"a": ${i % 7}, "k": $v, "b": "s$i"}"""
        case 2 => s"""{"nested": {"k": ${v + 1}}, "k": $v}"""
        case 3 => s"""{"a": "decoy \\"k\\": 9", "k": $v}"""
        case 4 => s"""{"other": $i}""" // k absent → both null
      }
    }
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = rows.toDF("j")
      .withColumn("ref", get_json_object(col("j"), "$.k").cast("long"))
      .withColumn("fast", GraftFunctions.jsonLong(col("j"), "k"))
    assert(df.filter(
      (col("ref").isNull =!= col("fast").isNull) ||
        (col("ref").isNotNull && col("ref") =!= col("fast"))).count() == 0L)
    // both paths found the same 1600 present keys
    assert(df.filter(col("fast").isNotNull).count() == 1600L)
  }

  test("codegen path: aggregation over json_long, null json included") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      Some("""{"k": 3}"""), Some("""{"k": 4}"""),
      Some("""{"a": 1}"""), None).toDF("j")
      .select(GraftFunctions.jsonLong(col("j"), "k").as("k"))
    // null input row → null output through the null-safe wrapper
    assert(df.filter(col("k").isNull).count() == 2L)
    val agg = df.agg(sum("k")).head.getLong(0)
    assert(agg == 7L)
  }
}
