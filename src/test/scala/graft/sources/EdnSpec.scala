package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class EdnSpec extends AnyFunSuite {
  import EdnValue._

  private def rt(s: String): String = Edn.print(Edn.parse(s))

  test("scalars round-trip") {
    assert(rt("nil") == "nil")
    assert(rt("true") == "true")
    assert(rt("42") == "42")
    assert(rt("-7") == "-7")
    assert(rt("3.5") == "3.5")
    assert(rt("\"hi\"") == "\"hi\"")
    assert(rt(":kw") == ":kw")
  }

  test("collections round-trip") {
    assert(rt("[1 2 3]") == "[1 2 3]")
    assert(Edn.parse("{:a 1, :b \"x\"}") ==
      M(Vector((Kw("a"), Num(1, isInt = true)), (Kw("b"), Str("x")))))
    assert(rt("[{:a [1 2]} nil]") == "[{:a [1 2]} nil]")
  }

  test("string escapes") {
    assert(Edn.parse("\"a\\\"b\\nc\"") == Str("a\"b\nc"))
    assert(Edn.print(Str("a\"b\nc")) == "\"a\\\"b\\nc\"")
  }

  test("commas are whitespace") {
    assert(Edn.parse("[1,2,3]") == Vec(Vector(Num(1, true), Num(2, true), Num(3, true))))
  }

  // Full printed-value surface (reference io.clj round-trips any pr-str'd
  // value via clojure.edn/read-string — io.clj:106-120, 214-228)

  test("sets round-trip, insertion order preserved") {
    assert(Edn.parse("#{1 2 3}") == SetV(Vector(Num(1, true), Num(2, true), Num(3, true))))
    assert(rt("#{:a :b}") == "#{:a :b}")
    assert(rt("#{}") == "#{}")
  }

  test("lists round-trip") {
    assert(Edn.parse("(1 2)") == Lst(Vector(Num(1, true), Num(2, true))))
    assert(rt("(a b (c))") == "(a b (c))")
    assert(rt("()") == "()")
  }

  test("symbols are distinct from keywords") {
    assert(Edn.parse("foo") == Sym("foo"))
    assert(Edn.parse("foo/bar") == Sym("foo/bar"))
    assert(Edn.parse(":foo/bar") == Kw("foo/bar"))
    assert(rt("foo") == "foo")
    assert(Edn.parse("-") == Sym("-"))
    assert(Edn.parse("-5") == Num(-5, true))
  }

  test("characters round-trip") {
    assert(Edn.parse("\\a") == Ch('a'))
    assert(Edn.parse("\\newline") == Ch('\n'))
    assert(Edn.parse("\\space") == Ch(' '))
    assert(Edn.parse("\\tab") == Ch('\t'))
    assert(Edn.parse("\\\\") == Ch('\\'))
    assert(Edn.parse("\\u0041") == Ch('A'))
    assert(rt("\\a") == "\\a")
    assert(rt("\\newline") == "\\newline")
    assert(rt("[\\a \\b]") == "[\\a \\b]")
  }

  test("tagged forms round-trip, nested") {
    assert(Edn.parse("#inst \"2015-03-30T12:00:00Z\"") ==
      Tagged("inst", Str("2015-03-30T12:00:00Z")))
    assert(rt("#inst \"2015-03-30T12:00:00Z\"") == "#inst \"2015-03-30T12:00:00Z\"")
    assert(rt("#uuid \"f81d4fae-7dec-11d0-a765-00a0c91e6bf6\"") ==
      "#uuid \"f81d4fae-7dec-11d0-a765-00a0c91e6bf6\"")
    assert(Edn.parse("#my/tag {:a #other [1]}") ==
      Tagged("my/tag", M(Vector((Kw("a"), Tagged("other", Vec(Vector(Num(1, true)))))))))
  }

  test("discard and comments are skipped") {
    assert(Edn.parse("[1 #_ 2 3]") == Vec(Vector(Num(1, true), Num(3, true))))
    assert(Edn.parse("[1 ; trailing\n 2]") == Vec(Vector(Num(1, true), Num(2, true))))
  }

  test("discard as the LAST element of a collection, nested, and at top level") {
    // hand-edited reference pr-str output can put #_ anywhere a form is
    assert(Edn.parse("[1 2 #_ 3]") == Vec(Vector(Num(1, true), Num(2, true))))
    assert(Edn.parse("[1 2 #_3]") == Vec(Vector(Num(1, true), Num(2, true))))
    assert(Edn.parse("(#_ 1)") == Lst(Vector()))
    assert(Edn.parse("#{1 #_ 2}") == SetV(Vector(Num(1, true))))
    assert(Edn.parse("{:a 1 #_ :b #_ 2}") == M(Vector((Kw("a"), Num(1, true)))))
    assert(Edn.parse("#_ #_ 1 2 3") == Num(3, true)) // stacked discards
    assert(Edn.parse("#_ [1 2] 7") == Num(7, true)) // discarded collection
    // a lone top-level discard leaves NO value — clear error, not StringIndexOutOfBounds
    val e = intercept[IllegalArgumentException](Edn.parse("#_ 3"))
    assert(e.getMessage.contains("end of EDN input"))
  }

  test("string unicode and control escapes") {
    assert(Edn.parse("\"\\u0041b\\t\"") == Str("Ab\t"))
    assert(Edn.print(Str("a\tb")) == "\"a\\tb\"")
  }

  test("integers beyond double precision round-trip bit-exactly") {
    assert(rt("9007199254740993") == "9007199254740993") // 2^53 + 1
    assert(rt("-9223372036854775808") == "-9223372036854775808") // Long.Min
    assert(Edn.parse("9007199254740993") == LongNum(9007199254740993L))
    assert(Edn.parse("42") == Num(42, isInt = true)) // small ints stay Num
  }

  test("ratio / bigint / bigdecimal round-trip (the clojure numeric tower pr-str emits)") {
    assert(Edn.parse("1/3") == Ratio(1, 3))
    assert(rt("1/3") == "1/3")
    assert(rt("-22/7") == "-22/7")
    assert(Edn.parse("123456789012345678901234567890N") ==
      BigIntNum(BigInt("123456789012345678901234567890")))
    assert(rt("123456789012345678901234567890N") == "123456789012345678901234567890N")
    assert(rt("3N") == "3N")
    assert(Edn.parse("1.50M") == BigDecNum(BigDecimal("1.50")))
    assert(rt("1.50M") == "1.50M") // scale preserved
    assert(rt("[1/2 3N 0.1M]") == "[1/2 3N 0.1M]")
  }

  test("deeply mixed value round-trips") {
    val s = "{:k #{1 2}, :v [(a \\c) #inst \"2020-01-01T00:00:00Z\"], \"s\" nil}"
    assert(rt(s) == s)
  }

  test("store-clj -> load-clj io round-trip carries the full value surface") {
    val spark = graft.SparkTestSession.spark
    implicit val e: org.apache.spark.sql.Encoder[EdnValue] =
      org.apache.spark.sql.Encoders.kryo[EdnValue]
    val values: Seq[EdnValue] = Seq(
      Edn.parse("{:a #{1 2}, :b (x y), :c \\newline}"),
      Edn.parse("#inst \"2020-01-01T00:00:00Z\""),
      Edn.parse("[9007199254740993 1/3 3N 1.50M foo :bar/baz]"))
    val dir = "target/io_tmp/edn_full_surface"
    GraftIO.storeClj(dir)(graft.core.Flow.of(spark)(values))
    val back = GraftIO.loadClj(spark, dir).dump().toSet
    assert(back == values.toSet)
  }
}
