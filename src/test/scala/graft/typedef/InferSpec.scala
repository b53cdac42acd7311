package graft.typedef

import java.math.{BigDecimal => JBigDecimal}
import java.time.{Instant, LocalDate}

import org.scalatest.funsuite.AnyFunSuite

import graft.typedef.TypeDef._

/** Port of the reference's inference unit tests
  * (`/root/reference/test/orca/core_test.clj:20-110`) — same assertion
  * values for behavioral fidelity. */
class InferSpec extends AnyFunSuite {

  private def td(v: Any, opts: InferOptions = InferOptions.default): TypeDef =
    Infer.infer(v, opts).get

  test("BigDecimal infers decimal with scale/precision props (core_test:21-23)") {
    assert(td(new JBigDecimal("10.0")) == TDecimal(Some(1), Some(3)))
  }

  test("Boolean (core_test:24-26)") {
    assert(td(true) == TBoolean)
    assert(td(false) == TBoolean)
  }

  test("integer narrowing boundaries (core_test:27-35)") {
    assert(td(10) == TTinyInt)
    assert(td(0) == TTinyInt)
    assert(td(10L) == TTinyInt) // narrowing is by value, not class
    assert(td(Short.MaxValue) == TSmallInt)
    assert(td(Short.MinValue) == TSmallInt)
    assert(td(Short.MaxValue + 1) == TInt)
    assert(td(Short.MinValue - 1) == TInt)
    assert(td(Int.MaxValue.toLong + 1) == TBigInt)
    assert(td(Int.MinValue.toLong - 1) == TBigInt)
    assert(td(new java.math.BigInteger("42")) == TBigInt)
  }

  test("Float / Double (core_test:36-42)") {
    assert(td(-1.0f) == TFloat)
    assert(td(Float.MaxValue) == TFloat)
    assert(td(Float.MinPositiveValue) == TFloat)
    assert(td(-1.0) == TDouble)
    assert(td(100.00) == TDouble)
  }

  test("String / Char (core_test:43-48)") {
    assert(td("") == TString)
    assert(td("foo") == TString)
    assert(td('\n') == TChar(Some(1)))
    assert(td(Array('f', 'o', 'o')) == TChar(None))
  }

  test("Instant / LocalDate (core_test:49-52)") {
    assert(td(Instant.parse("2017-04-07T17:24:03.222Z")) == TTimestamp)
    assert(td(LocalDate.of(2017, 4, 3)) == TDate)
  }

  test("string coercion options (core_test:55-61)") {
    assert(td("foo") == TString)
    assert(td("10") == TString)
    assert(td("10", InferOptions(coerceDecimalStrings = true)) == TDecimal(Some(0), Some(2)))
    assert(td("2017-04-10", InferOptions(coerceDateStrings = true)) == TDate)
    assert(td("2017-05-07T06:39:18Z", InferOptions(coerceTimestampStrings = true)) == TTimestamp)
    // non-parse falls back to string
    assert(td("foo", InferOptions(coerceDateStrings = true, coerceTimestampStrings = true,
      coerceDecimalStrings = true)) == TString)
  }

  test("decimal floors (core_test:62-63)") {
    assert(td(new JBigDecimal("10"), InferOptions(minDecimalScale = Some(2), minDecimalPrecision = Some(10)))
      == TDecimal(Some(2), Some(10)))
  }

  test("arrays (core_test:64-67)") {
    assert(td(Seq(1)) == TArray(TTinyInt))
    assert(td(Seq(1, -1)) == TArray(TTinyInt))
    assert(td(Seq(1, null)) == TArray(TTinyInt))
    assert(Infer.infer(Seq.empty[Any]) == None) // empty list carries no type
  }

  test("arrays of compound types infer heterogeneous sets (core_test:68-75)") {
    val expected = TArray(Set[TypeDef](
      TStruct.of("a" -> TTinyInt),
      TStruct.of("a" -> TSmallInt, "b" -> TString),
      TStruct.of("a" -> TSmallInt)))
    assert(td(Seq(Map("a" -> 1), Map("a" -> 10000), Map("a" -> 10001, "b" -> "foo"))) == expected)
  }

  test("maps infer as structs with normalized keys (core_test:76-84)") {
    assert(td(scala.collection.immutable.ListMap[Any, Any]("a" -> 1, "foo" -> "bar", 10 -> 11))
      == TStruct.of("a" -> TTinyInt, "foo" -> TString, "10" -> TTinyInt))
    assert(td(Map("_meta" -> Map("x" -> 10, "y" -> Seq("a", "b", Seq("foo")))))
      == TStruct.of("_meta" -> TStruct.of(
        "x" -> TTinyInt,
        "y" -> TArray(Set[TypeDef](TString, TArray(TString))))))
  }

  test("override-struct pins a field type (core_test:85-86)") {
    assert(td(Map("_meta" -> Map("x" -> 10, "y" -> Seq("a", "b", Seq("foo")))),
      InferOptions(overrideStruct = Map("y" -> TString)))
      == TStruct.of("_meta" -> TStruct.of("x" -> TTinyInt, "y" -> TString)))
  }

  test("null infers nothing; struct fields holding null are dropped (core_test:187)") {
    assert(Infer.infer(null) == None)
    assert(td(Map("a" -> 1, "b" -> null)) == TStruct.of("a" -> TTinyInt))
  }

  test("typedef → schema string (core_test:91-110)") {
    def s(v: Any): String = TypeDef.print(Merge.simplify(td(v)).get)
    assert(s(1) == "tinyint")
    assert(s(128) == "smallint")
    assert(s(Short.MaxValue + 1) == "int")
    assert(s(Int.MaxValue.toLong + 1) == "bigint")
    assert(s(1.0f) == "float")
    assert(s(1.0) == "double")
    assert(s("hello") == "string")
    assert(s(new JBigDecimal("1.0")) == "decimal(2,1)")
    assert(s(scala.collection.immutable.ListMap("k" -> "foo", "y" -> true)) == "struct<k:string,y:boolean>")
    assert(s(LocalDate.of(2017, 1, 1)) == "date")
    assert(s(Instant.now()) == "timestamp")
    assert(TypeDef.print(TMap(TString, TString)) == "map<string,string>")
  }

  test("schema string → typedef (core_test:112-125)") {
    import TypeDef.parse
    assert(parse("boolean") == TBoolean)
    assert(parse("string") == TString)
    assert(parse("tinyint") == TTinyInt)
    assert(parse("smallint") == TSmallInt)
    assert(parse("int") == TInt)
    assert(parse("bigint") == TBigInt)
    assert(parse("float") == TFloat)
    assert(parse("double") == TDouble)
    assert(parse("timestamp") == TTimestamp)
    assert(parse("array<int>") == TArray(TInt))
    assert(parse("map<string,string>") == TMap(TString, TString))
    assert(parse("struct<x:double>") == TStruct.of("x" -> TDouble))
    assert(parse("decimal(10,5)") == TDecimal(Some(5), Some(10)))
  }
}
