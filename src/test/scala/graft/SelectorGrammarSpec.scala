package graft

import graft.selector.SelectorParser
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-parity pin vs lol_html 1.2.1's selector VM (the engine the
  * reference delegates selector matching to, /root/reference/Cargo.toml;
  * SURVEY.md §2.5 has the full parity table): everything lol_html
  * supports parses; everything it rejects errors with an explicit
  * message (sibling combinators, pseudo-classes/-elements beyond :not,
  * nested negation). */
class SelectorGrammarSpec extends AnyFunSuite {

  private def ok(s: String): Unit =
    assert(SelectorParser.parse(s).isRight, s"should parse: $s")
  private def err(s: String): String =
    SelectorParser.parse(s).swap.getOrElse(fail(s"should NOT parse: $s"))

  test("supported grammar parses: tags, *, #id, .class, attrs, :not, > and descendant, commas") {
    ok("*")
    ok("div")
    ok("#a")
    ok(".warn")
    ok("div#a.b.c")
    ok("[disabled]")
    ok("[href^=http]")
    ok("[href$='.png']")
    ok("[title*=\"mid dle\"]")
    ok("[class~=word]")
    ok("[lang|=en]")
    ok("a[href][rel=nofollow]")
    ok("div > p span")
    ok("ul > li#a[data-k=v1]:not(.c2)")
    ok(":not(a, [b], .c)")
    ok("h1, h2 > em, .x .y")
  }

  test("sibling combinators are rejected like lol_html's UnsupportedCombinator") {
    assert(err("h1 + p").contains("unsupported combinator '+'"))
    assert(err("h1+p").contains("unsupported combinator '+'"))
    assert(err("h1 ~ p").contains("unsupported combinator '~'"))
    // but '~' inside an attribute operator is fine
    ok("p[class~=x]")
  }

  test("pseudo-classes beyond :not and all pseudo-elements are rejected") {
    assert(err("li:nth-child(2)").contains("unsupported pseudo-class :nth-child"))
    assert(err("p:first-child").contains("unsupported pseudo-class :first-child"))
    assert(err("a:hover").contains("unsupported pseudo-class :hover"))
    assert(err("p::before").contains("unsupported pseudo-element"))
  }

  test("nested :not is rejected like lol_html's NestedNegation") {
    assert(err("div:not(:not(a))").contains("nested :not"))
    assert(err(":not(a, :not(b))").contains("nested :not"))
  }

  test("malformed selectors error, never mis-parse") {
    assert(err("div[").nonEmpty) // p1/p5 pin the exact message via the engine
    assert(err("[a=unterminated'").nonEmpty)
    assert(err("..x").nonEmpty)
    assert(err("a >").nonEmpty)
    assert(err("(").nonEmpty)
    // case-insensitivity flag is NOT in the supported subset: explicit error
    assert(err("[a=b i]").nonEmpty)
  }
}
