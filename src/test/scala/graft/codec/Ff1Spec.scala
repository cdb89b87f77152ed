package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** FF1 against the official NIST SP 800-38G sample vectors
  * (csrc.nist.gov "FF1samples.pdf" — all nine published cases:
  * AES-128/192/256 × {empty tweak, 10-byte tweak, radix-36 with an
  * 11-byte tweak}), plus round-trip and domain-guard properties. */
class Ff1Spec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val key128 = hex("2B7E151628AED2A6ABF7158809CF4F3C")
  private val key192 = hex("2B7E151628AED2A6ABF7158809CF4F3CEF4359D8D580AA4F")
  private val key256 = hex("2B7E151628AED2A6ABF7158809CF4F3CEF4359D8D580AA4F7F036D6F04FC6A94")
  private val tweak10 = hex("39383736353433323130")
  private val tweak11 = hex("3737373770717273373737")

  private val base36 = "0123456789abcdefghijklmnopqrstuvwxyz"

  private def digits10(s: String): Array[Int] = s.map(_ - '0').toArray
  private def str10(d: Array[Int]): String = d.map(x => ('0' + x).toChar).mkString
  private def digits36(s: String): Array[Int] = s.map(base36.indexOf(_)).toArray
  private def str36(d: Array[Int]): String = d.map(base36.charAt).mkString

  private val pt10 = "0123456789"
  private val pt36 = "0123456789abcdefghi"

  private val vectors: Seq[(String, Array[Byte], Array[Byte], Int, String, String)] = Seq(
    ("sample1", key128, Array.emptyByteArray, 10, pt10, "2433477484"),
    ("sample2", key128, tweak10, 10, pt10, "6124200773"),
    ("sample3", key128, tweak11, 36, pt36, "a9tv40mll9kdu509eum"),
    ("sample4", key192, Array.emptyByteArray, 10, pt10, "2830668132"),
    ("sample5", key192, tweak10, 10, pt10, "2496655549"),
    ("sample6", key192, tweak11, 36, pt36, "xbj3kv35jrawxv32ysr"),
    ("sample7", key256, Array.emptyByteArray, 10, pt10, "6657667009"),
    ("sample8", key256, tweak10, 10, pt10, "1001623463"),
    ("sample9", key256, tweak11, 36, pt36, "xs8a0azh2avyalyzuwd"))

  for ((name, key, tweak, radix, pt, ct) <- vectors) {
    test(s"NIST $name: radix $radix, key ${key.length * 8} bits, tweak ${tweak.length}B") {
      val (toD, toS): (String => Array[Int], Array[Int] => String) =
        if (radix == 10) (digits10, str10) else (digits36, str36)
      assert(toS(Ff1.encrypt(key, tweak, radix, toD(pt))) === ct)
      assert(toS(Ff1.decrypt(key, tweak, radix, toD(ct))) === pt)
    }
  }

  test("round-trip across radixes, lengths (odd and even) and tweaks") {
    val rnd = new scala.util.Random(42)
    for (radix <- Seq(2, 10, 26, 36, 62, 256); n <- Seq(2, 3, 7, 16, 31); _ <- 1 to 3) {
      if (Ff1.domainOk(radix, n)) {
        val pt = Array.fill(n)(rnd.nextInt(radix))
        val tw = Array.fill(rnd.nextInt(8))(rnd.nextInt(256).toByte)
        val ct = Ff1.encrypt(key128, tw, radix, pt)
        assert(ct.length === n)
        assert(ct.forall(d => d >= 0 && d < radix))
        assert(Ff1.decrypt(key128, tw, radix, ct).toSeq === pt.toSeq, s"radix=$radix n=$n")
      }
    }
  }

  test("domain guard: tiny domains and bad digits are rejected") {
    assert(!Ff1.domainOk(10, 1))
    assert(!Ff1.domainOk(2, 6)) // 2^6 = 64 < 100
    assert(Ff1.domainOk(2, 7)) // 2^7 = 128 >= 100
    assert(Ff1.domainOk(10, 2))
    intercept[IllegalArgumentException](Ff1.encrypt(key128, Array.emptyByteArray, 10, Array(1)))
    intercept[IllegalArgumentException](Ff1.encrypt(key128, Array.emptyByteArray, 10, Array(1, 10)))
    intercept[IllegalArgumentException](Ff1.encrypt(hex("00"), Array.emptyByteArray, 10, digits10(pt10)))
  }

  test("tweak is a real domain separator") {
    val a = Ff1.encrypt(key128, "col_a".getBytes, 10, digits10(pt10))
    val b = Ff1.encrypt(key128, "col_b".getBytes, 10, digits10(pt10))
    assert(str10(a) !== str10(b))
  }
}
