package graft.sources

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Order-correctness of the manifest comparator: [[TxLog.utf8Lte]] must
  * agree with Spark's own `UTF8String` comparison (the order parquet
  * stats and pushed string filters use) on ARBITRARY strings — the
  * supplementary-plane divergence from Java's UTF-16 order is exactly
  * the class of input a fixture-only test would under-sample.
  */
object TxLogProps extends Properties("TxLog") {

  // weight the generator toward the adversarial ranges: astral chars
  // (surrogate pairs), U+E000-U+FFFF (above surrogates in UTF-16), and
  // plain ASCII — plus shared prefixes so the tiebreak paths run
  private val genChar: Gen[String] = Gen.frequency(
    3 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.choose(0xe000, 0xfffd).map(i => new String(Character.toChars(i))),
    2 -> Gen.choose(0x10000, 0x10ffff).map(i => new String(Character.toChars(i))),
    1 -> Gen.choose(0x80, 0x7ff).map(i => new String(Character.toChars(i))))

  private val genStr: Gen[String] =
    Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, genChar).map(_.mkString))

  private val genPair: Gen[(String, String)] = for {
    prefix <- genStr
    a <- genStr
    b <- genStr
    sharePrefix <- Gen.oneOf(true, false)
  } yield if (sharePrefix) (prefix + a, prefix + b) else (a, b)

  property("utf8Lte equals Spark's UTF8String order on arbitrary strings") =
    Prop.forAll(genPair) { case (a, b) =>
      val want = UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) <= 0
      TxLog.utf8Lte(a, b) == want
    }

  property("utf8Lte is a total order: antisymmetry + totality") =
    Prop.forAll(genPair) { case (a, b) =>
      val ab = TxLog.utf8Lte(a, b)
      val ba = TxLog.utf8Lte(b, a)
      (ab || ba) && ((ab && ba) == (a == b))
    }
}
