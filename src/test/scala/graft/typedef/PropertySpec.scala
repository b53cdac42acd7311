package graft.typedef

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.typedef.TypeDef._

/** Randomized properties over the typedef algebra (SURVEY §5), run with
  * raw ScalaCheck (the scalatest bridge isn't in the offline cache). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  // ---- generators -----------------------------------------------------

  private val scalarGen: Gen[TypeDef] = Gen.oneOf(
    TBoolean, TTinyInt, TSmallInt, TInt, TBigInt, TFloat, TDouble,
    TString, TBinary, TDate, TTimestamp)

  private val decimalGen: Gen[TypeDef] = for {
    p <- Gen.choose(1, 38)
    s <- Gen.choose(0, p)
  } yield TDecimal(Some(s), Some(p))

  private val nameGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)

  private def typeDefGen(depth: Int): Gen[TypeDef] =
    if (depth == 0) Gen.frequency(5 -> scalarGen, 1 -> decimalGen)
    else Gen.frequency(
      4 -> scalarGen,
      1 -> decimalGen,
      1 -> typeDefGen(depth - 1).map(TArray(_)),
      1 -> (for {
        k <- Gen.oneOf[TypeDef](TString, TInt)
        v <- typeDefGen(depth - 1)
      } yield TMap(k, v)),
      1 -> (for {
        n <- Gen.choose(1, 4)
        names <- Gen.listOfN(n, nameGen).map(_.distinct)
        tds <- Gen.listOfN(names.size, typeDefGen(depth - 1))
      } yield TStruct.of(names.zip(tds): _*)))

  private def valueGen(depth: Int): Gen[Any] =
    if (depth == 0)
      Gen.oneOf(
        Gen.choose(Long.MinValue, Long.MaxValue),
        Gen.choose(-1e9, 1e9),
        Gen.alphaStr,
        Gen.oneOf(true, false),
        Gen.choose(0L, 30000L).map(java.time.LocalDate.ofEpochDay),
        Gen.choose(0L, 4102444800000L).map(java.time.Instant.ofEpochMilli),
        Gen.choose(-1e6, 1e6).map(d => new java.math.BigDecimal(String.valueOf(d))))
    else
      Gen.frequency(
        3 -> valueGen(0),
        1 -> Gen.nonEmptyListOf(valueGen(0)).map(_.take(5)),
        1 -> (for {
          n <- Gen.choose(1, 4)
          ks <- Gen.listOfN(n, nameGen).map(_.distinct)
          vs <- Gen.listOfN(ks.size, valueGen(depth - 1))
        } yield ks.zip(vs).toMap))

  // ---- properties -----------------------------------------------------

  test("property: print ∘ parse is identity on schema-ready typedefs") {
    check(Prop.forAll(typeDefGen(2)) { td =>
      TypeDef.parse(TypeDef.print(td)) == td
    }, "print/parse roundtrip")
  }

  test("property: toSparkType ∘ fromSparkType is identity (modulo char/varchar)") {
    check(Prop.forAll(typeDefGen(2)) { td =>
      TypeDef.fromSparkType(TypeDef.toSparkType(td)) == td
    }, "spark-type roundtrip")
  }

  test("property: inference either types a value or throws the strict-merge error") {
    // mixed-type arrays (e.g. [double, bigdecimal]) are UNMERGEABLE by
    // design — the reference's simplify throws the same way
    // (core.clj:381-382,407-411); what must never happen is a wrong or
    // unprintable typedef
    check(Prop.forAll(valueGen(2)) { v =>
      try {
        Infer.infer(v) match {
          case None => true // null-like values carry no type
          case Some(td) => Merge.simplify(td) match {
            case None => true // empty-struct pruning
            case Some(s) => TypeDef.print(s).nonEmpty
          }
        }
      } catch { case e: Merge.UnmergeableException => true }
    }, "infer→simplify→print totality-or-strict-throw")
  }

  /** Pairs Hive's lattice makes mutually convertible — the documented
    * order-dependent cases (see Merge scaladoc). */
  private def mutuallyConvertible(a: TypeDef, b: TypeDef): Boolean = {
    val kinds = Set(Merge.kind(a), Merge.kind(b))
    Seq(Set("string", "double"), Set("string", "varchar"),
      Set("double", "varchar"), Set("decimal", "varchar")).contains(kinds)
  }

  test("property: scalar merge is symmetric except on mutually-convertible pairs") {
    val g = Gen.oneOf(scalarGen, decimalGen)
    check(Prop.forAll(g, g) { (a, b) =>
      val ab = try Right(Merge.merge(a, b)) catch { case e: Merge.UnmergeableException => Left(()) }
      val ba = try Right(Merge.merge(b, a)) catch { case e: Merge.UnmergeableException => Left(()) }
      if (mutuallyConvertible(a, b)) ab.isRight == ba.isRight // both resolve, to different targets
      else ab == ba
    }, "merge symmetry")
  }

  test("property: merge with self is identity") {
    check(Prop.forAll(typeDefGen(2)) { td =>
      Merge.merge(td, td) == td
    }, "merge idempotence")
  }

  test("property: integer narrowing brackets the value") {
    check(Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { x =>
      Infer.narrow(x) match {
        case TTinyInt  => x >= Byte.MinValue && x <= Byte.MaxValue
        case TSmallInt => x >= Short.MinValue && x <= Short.MaxValue
        case TInt      => x >= Int.MinValue && x <= Int.MaxValue
        case TBigInt   => true
        case other     => false
      }
    }, "narrowing brackets")
  }

  test("property: row-order invariance of dataset inference outside the mutually-convertible pairs") {
    // longs/strings/booleans only — the associative subdomain. Outside
    // it the reference's fold is genuinely order-dependent, two ways:
    // mutually-convertible pairs (string↔double), and absorbing chains
    // (string⊔int⊔date folds to string left-to-right, but int⊔date
    // throws) — property-discovered, documented on Merge/inferTypeDef
    val rowsGen = for {
      n <- Gen.choose(2, 6)
      rows <- Gen.listOfN(n, for {
        ks <- Gen.someOf(Seq("a", "b", "c")).map(_.toSeq)
        vs <- Gen.listOfN(ks.size, Gen.oneOf(
          Gen.choose(-100000L, 100000L), Gen.alphaStr,
          Gen.oneOf(true, false)))
      } yield ks.zip(vs).toMap)
    } yield rows
    check(Prop.forAll(rowsGen) { rows =>
      def result(rs: Seq[Map[String, Any]]) =
        try Right(Merge.rowsToTypeDef(rs)) catch { case e: Merge.UnmergeableException => Left(()) }
      result(rows) == result(rows.reverse)
    }, "row-order invariance")
  }
}
