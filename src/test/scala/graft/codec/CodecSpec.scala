package graft.codec

import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {

  def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  // --- BLAKE2b: RFC 7693 appendix A vector ---
  test("Blake2b-512 of 'abc' matches RFC 7693") {
    val out = Blake2b.hash(64, "abc".getBytes("UTF-8"))
    assert(hex(out) ===
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
      "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
  }

  test("Blake2b multi-block streaming equals one-shot") {
    val data = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val oneShot = Blake2b.hash(64, data)
    val d = new Blake2b(64)
    data.grouped(7).foreach(chunk => d.update(chunk))
    assert(hex(d.digest()) === hex(oneShot))
  }

  test("Blake2b variable digest lengths are distinct and sized") {
    for (len <- Seq(1, 16, 32, 48, 64)) {
      assert(Blake2b.hash(len, "graft".getBytes).length === len)
    }
  }

  // --- scrypt: RFC 7914 §12 vectors ---
  test("scrypt RFC 7914 vector: empty password/salt N=16") {
    val out = ScryptEngine.generate(Array.empty[Byte], Array.empty[Byte], 16, 1, 1, 64)
    assert(hex(out) ===
      "77d6576238657b203b19ca42c18a0497f16b4844e3074ae8dfdffa3fede21442" +
      "fcd0069ded0948f8326a753a0fc81f17e8d3e0fb2e0d3628cf35e20c38d18906")
  }

  test("scrypt RFC 7914 vector: password/NaCl N=1024 r=8 p=16") {
    val out = ScryptEngine.generate("password".getBytes, "NaCl".getBytes, 1024, 8, 16, 64)
    assert(hex(out) ===
      "fdbabe1c9d3472007856e7190d01e9fe7c6ad7cbc8237830e77376634b373162" +
      "2eaf30d92e22a3886ff109279d9830dac727afb94a83ee6d8360cbdfa2cc0640")
  }

  // --- Argon2id: RFC 9106 §5.3 test vector ---
  test("Argon2id RFC 9106 test vector (m=32, t=3, p=4, keyed)") {
    val e = new Argon2Engine(parallelism = 4, memoryKB = 32, iterations = 3)
    val out = e.hash(
      password = Array.fill[Byte](32)(0x01),
      salt = Array.fill[Byte](16)(0x02),
      outLen = 32,
      secret = Array.fill[Byte](8)(0x03),
      additional = Array.fill[Byte](12)(0x04))
    assert(hex(out) === "0d640df58d78766c08c037a34a8b53c9d01ef0452d75b65eb52520e96b01e659")
  }

  test("Argon2id is deterministic and parameter-sensitive") {
    val e1 = new Argon2Engine(2, 64, 2)
    val e1b = new Argon2Engine(2, 64, 2)
    val e2 = new Argon2Engine(2, 64, 3)
    val p = "password".getBytes
    val s = "somesaltsomesalt".getBytes
    assert(hex(e1.hash(p, s, 32)) === hex(e1b.hash(p, s, 32)))
    assert(hex(e1.hash(p, s, 32)) !== hex(e2.hash(p, s, 32)))
    assert(hex(e1.hash(p, s, 32)) !== hex(e1.hash(p, "othersaltothersal".getBytes, 32)))
  }

  test("Argon2id handles outputs > 64 bytes (H' long path)") {
    val e = new Argon2Engine(1, 32, 1)
    val out = e.hash("pw".getBytes, "saltsalt".getBytes, 128)
    assert(out.length === 128)
    // H' chaining must not repeat 32-byte windows
    assert(hex(out.slice(0, 32)) !== hex(out.slice(32, 64)))
  }

  // --- Codec trait semantics (reference MaskDataPlugin.scala:135-153) ---
  val passphrase: Array[Byte] =
    ("0123456789abcdef" * 4).getBytes // 64 chars

  test("deterministic hash: same value -> same bytes; different value -> different") {
    val c = new Pbkdf2Codec(64, 64)
    val h1 = c.hash("alice", deterministic = true, passphrase)
    val h2 = c.hash("alice", deterministic = true, passphrase)
    val h3 = c.hash("bob", deterministic = true, passphrase)
    assert(h1.length === 64)
    assert(hex(h1) === hex(h2))
    assert(hex(h1) !== hex(h3))
  }

  test("non-deterministic hash ignores value and differs per call") {
    val c = new Pbkdf2Codec(64, 64)
    val h1 = c.hash("alice", deterministic = false, passphrase)
    val h2 = c.hash("alice", deterministic = false, passphrase)
    assert(h1.length === 64)
    assert(hex(h1) !== hex(h2))
  }

  test("hashLong returns signed first-8-bytes and is deterministic") {
    val c = new Pbkdf2Codec(64, 64)
    val l1 = c.hashLong("alice", deterministic = true, passphrase)
    val l2 = c.hashLong("alice", deterministic = true, passphrase)
    assert(l1 === l2)
    val h = c.hash("alice", deterministic = true, passphrase)
    assert(l1 === java.nio.ByteBuffer.wrap(h).getLong)
  }

  test("passphrase split: first half feeds password, second half salts") {
    val c = new Pbkdf2Codec(64, 64)
    // manual recomputation of the split semantics
    val (pass, salt) = passphrase.splitAt(passphrase.length / 2)
    val manual = c.encrypt("alice".toCharArray ++ pass.map(_.toChar), salt)
    assert(hex(c.hash("alice", deterministic = true, passphrase)) === hex(manual))
  }

  test("all three codecs produce 64-byte deterministic hashes") {
    val fastEnv = Seq(
      new Argon2Codec(2, 64, 1),
      new ScryptCodec(64, 2, 1),
      new Pbkdf2Codec(64, 64))
    for (c <- fastEnv) {
      val h1 = c.hash("value", deterministic = true, passphrase)
      val h2 = c.hash("value", deterministic = true, passphrase)
      assert(h1.length === 64, c.name)
      assert(hex(h1) === hex(h2), c.name)
    }
  }

  test("ServiceLoader discovers third-party codecs from META-INF/services") {
    val names = Codec.all.map(_.name)
    // built-ins always first and present
    assert(names.take(3) === List("Argon2", "SCrypt", "PBKDF2WithHmacSHA512"))
    // the test-classpath codec (src/test/resources/META-INF/services) appears
    assert(names.contains("TestVector"))
    val tv = Codec.all.find(_.name == "TestVector").get
    val h1 = tv.hash("alice", deterministic = true, passphrase)
    assert(h1.length === 64)
    assert(hex(h1) === hex(tv.hash("alice", deterministic = true, passphrase)))
  }

  test("ServiceLoader discovery cannot shadow a built-in codec name") {
    val names = Codec.all.map(_.name)
    assert(names.count(_ == "Argon2") === 1)
    assert(Codec.all.find(_.name == "Argon2").get.isInstanceOf[Argon2Codec])
  }

  test("published jar registers built-ins in META-INF/services (main classpath)") {
    // the MAIN-classpath services file (src/main/resources) must list the
    // built-ins so a third party loading the published jar discovers them
    // exactly like the reference's ServiceLoader registration — not only
    // via the compiled-in list
    import scala.jdk.CollectionConverters._
    val discovered = java.util.ServiceLoader.load(classOf[Codec])
      .iterator().asScala.map(_.name).toSet
    assert(Set("Argon2", "SCrypt", "PBKDF2WithHmacSHA512").subsetOf(discovered))
    // and Codec.all stays duplicate-free even though built-ins are now ALSO
    // ServiceLoader-visible (name-collision filter keeps the audited ones)
    assert(Codec.all.map(_.name).groupBy(identity).values.forall(_.size == 1))
  }
}
