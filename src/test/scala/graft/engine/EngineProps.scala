package graft.engine

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.types._

/** ScalaCheck laws for the pure (non-Spark) engine semantics — run by sbt's
  * native ScalaCheck integration.
  */
object EngineProps extends Properties("Engine") {

  private val rawName: Gen[String] = for {
    n <- Gen.chooseNum(1, 12)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.const(' '), 1 -> Gen.const('-'),
      1 -> Gen.const('.')))
  } yield cs.mkString

  property("normalizeName is idempotent") = Prop.forAll(rawName) { n =>
    Schemas.normalizeName(Schemas.normalizeName(n)) == Schemas.normalizeName(n)
  }

  property("normalizeName output alphabet is [a-z0-9_]") =
    Prop.forAll(rawName) { n =>
      Schemas.normalizeName(n).forall(c =>
        c == '_' || c.isDigit || (c.isLetter && c.isLower))
    }

  private val struct: Gen[StructType] = for {
    n <- Gen.chooseNum(1, 6)
    names <- Gen.listOfN(n, Gen.identifier.map(_.take(8))).map(_.distinct)
  } yield StructType(names.map(StructField(_, StringType)))

  property("evolution: self-match is always Truncate") =
    Prop.forAll(struct) { s => Evolution.plan(Some(s), s) == Evolution.Truncate }

  property("evolution: metadata columns never flip the decision") =
    Prop.forAll(struct) { s =>
      val withMeta = s.add(StructField("loaded_at", TimestampType))
        .add(StructField("load_date", DateType))
      Evolution.plan(Some(withMeta), s) == Evolution.Truncate &&
        Evolution.plan(Some(s), withMeta) == Evolution.Truncate
    }

  property("evolution: adding a data column forces Recreate") =
    Prop.forAll(struct) { s =>
      val grown = s.add(StructField("zz_new_col", StringType))
      Evolution.plan(Some(s), grown) == Evolution.Recreate
    }

  property("namesMatch is symmetric") =
    Prop.forAll(struct, struct) { (a, b) =>
      Schemas.namesMatch(a, b) == Schemas.namesMatch(b, a)
    }
}
