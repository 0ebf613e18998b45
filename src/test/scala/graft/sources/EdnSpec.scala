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
}
