package graft.typedef

import org.scalatest.funsuite.AnyFunSuite

import graft.typedef.TypeDef._
import graft.typedef.Merge._

/** Port of the reference's merge/simplify tests
  * (`/root/reference/test/orca/core_test.clj:127-154`) plus exhaustive
  * algebraic properties over the widening lattice (SURVEY §5 — the scalar
  * domain is small enough to enumerate completely, stronger than random
  * sampling). */
class MergeSpec extends AnyFunSuite {

  test("structs: field union (core_test:128-129)") {
    assert(merge(TStruct.of("x" -> TTinyInt), TStruct.of("y" -> TBoolean))
      == TStruct.of("x" -> TTinyInt, "y" -> TBoolean))
  }

  test("primitive integers widen (core_test:130-135)") {
    assert(merge(TSmallInt, TTinyInt) == TSmallInt)
    assert(merge(TSmallInt, TBigInt) == TBigInt)
    assert(merge(TTinyInt, TSmallInt) == TSmallInt)
    assert(merge(TSmallInt, TSmallInt) == TSmallInt)
  }

  test("coercible: tinyint into double (core_test:136-137)") {
    assert(merge(TDouble, TTinyInt) == TDouble)
  }

  test("single value mergeAll (core_test:138-139)") {
    assert(mergeAll(Seq(TSmallInt)) == TSmallInt)
  }

  test("decimal(props) ⊔ string → string (core_test:140-141)") {
    assert(merge(TDecimal(Some(4), Some(0)), TString) == TString)
  }

  test("decimals: fieldwise max (core_test:142-143)") {
    assert(merge(TDecimal(Some(2), Some(6)), TDecimal(Some(1), Some(6)))
      == TDecimal(Some(2), Some(6)))
    // one-sided props adopt the other's (merge-with max semantics)
    assert(merge(TDecimal(Some(2), None), TDecimal(Some(1), Some(6)))
      == TDecimal(Some(2), Some(6)))
  }

  test("arrays merge children (core_test:144-145)") {
    assert(merge(TArray(TTinyInt), TArray(TInt)) == TArray(TInt))
  }

  test("lattice targets beyond integrals (core.clj:103-114)") {
    assert(merge(TBigInt, TFloat) == TFloat)     // bigint→float per Hive
    assert(merge(TString, TDouble) == TDouble)   // string→double per Hive
    assert(merge(TTimestamp, TString) == TString)
    assert(merge(TDate, TString) == TString)
    assert(merge(TFloat, TDouble) == TDouble)
  }

  test("unmergeable pairs throw (core.clj:381-382)") {
    assertThrows[UnmergeableException](merge(TBoolean, TInt))
    assertThrows[UnmergeableException](merge(TStruct.of("x" -> TInt), TArray(TInt)))
    assertThrows[UnmergeableException](merge(TDate, TTimestamp))
  }

  test("simplify arrays: heterogeneous child set collapses (core_test:148-149)") {
    assert(simplify(TArray(Set[TypeDef](TTinyInt, TInt))) == Some(TArray(TInt)))
  }

  test("simplify struct with array (core_test:150-151)") {
    assert(simplify(TStruct.of("values" -> TArray(Set[TypeDef](TTinyInt, TInt))))
      == Some(TStruct.of("values" -> TArray(TInt))))
  }

  test("simplify prunes empty structs (core_test:152-154)") {
    assert(simplify(TStruct.of("values" -> TStruct.of(), "a" -> TTinyInt))
      == Some(TStruct.of("a" -> TTinyInt)))
    assert(simplify(TStruct.of("values" -> TStruct.of())) == None)
  }

  test("rowsToTypeDef: per-row infer → simplify → fold (core.clj:431-437)") {
    val rows = Seq(
      Map("x" -> 1, "y" -> "a"),
      Map("x" -> 40000))
    assert(Merge.rowsToTypeDef(rows) == Some(TStruct.of("x" -> TInt, "y" -> TString)))
  }

  // ---- exhaustive algebraic properties over the scalar lattice ---------

  private val integralsAll: Seq[TypeDef] = Seq(TTinyInt, TSmallInt, TInt, TBigInt)
  private val numericAll: Seq[TypeDef] = integralsAll ++ Seq(TFloat, TDouble)

  test("property: integral widening is commutative and associative (exhaustive)") {
    for (a <- integralsAll; b <- integralsAll) assert(merge(a, b) == merge(b, a))
    for (a <- integralsAll; b <- integralsAll; c <- integralsAll)
      assert(merge(merge(a, b), c) == merge(a, merge(b, c)))
  }

  test("property: numeric merge is idempotent and upper-bounding (exhaustive)") {
    for (a <- numericAll) assert(merge(a, a) == a)
    for (a <- numericAll; b <- numericAll) {
      val m = merge(a, b)
      assert(merge(m, a) == m && merge(m, b) == m)
    }
  }

  test("property: simplify is idempotent (exhaustive over nested shapes)") {
    val shapes: Seq[TypeDef] =
      Seq[TypeDef](TTinyInt, TString, TBoolean, TDouble) ++
        Seq(TTinyInt, TInt).map(t => TArray(Set[TypeDef](t, TBigInt))) ++
        Seq[TypeDef](TString, TDouble).map(t => TStruct.of("a" -> t, "b" -> TStruct.of())) ++
        Seq(TStruct.of("x" -> TArray(Set[TypeDef](TTinyInt, TSmallInt)), "y" -> TStruct.of()))
    for (td <- shapes) {
      val once = simplify(td)
      assert(once.flatMap(simplify) == once)
    }
  }
}
