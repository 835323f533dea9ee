package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Analyzer.Token

/** Golden vectors for the non-Latin contrib analyzer family (CJK,
  * Chinese, Czech, Greek, Persian, Thai, Arabic) — expected outputs
  * hand-derived from the reference semantics (CJKTokenizer.cs bigram
  * scan, ChineseFilter.cs drops, GreekLowerCaseFilter fold,
  * ArabicNormalizer/ArabicStemmer light rules, ThaiWordFilter
  * BreakIterator segmentation). */
class IntlAnalyzersSpec extends AnyFunSuite {

  test("CJK bigrams: overlapping two-char tokens, Latin runs intact") {
    assert(Analyzers.tokenize(Analyzers.Cjk, "java 一二三四 the 五") ==
      Vector(Token("java", 0), Token("一二", 1), Token("二三", 2),
        Token("三四", 3), Token("五", 5))) // the(4) stopped
    // a lone CJK char emits itself; empty/whitespace emits nothing
    assert(IntlAnalyzers.cjkBigrams("一") == Vector(Token("一", 0)))
    assert(IntlAnalyzers.cjkBigrams("  ") == Vector.empty)
  }

  test("Chinese unigrams + ChineseFilter single-letter/stop drops") {
    assert(Analyzers.tokenize(Analyzers.Chinese, "一二三 abc a the") ==
      Vector(Token("一", 0), Token("二", 1), Token("三", 2),
        Token("abc", 3))) // a(4) single letter, the(5) stop
  }

  test("Czech chain: stop words with gap positions, no stemming") {
    assert(Analyzers.tokenize(Analyzers.Czech,
      "tento dokument je na serveru") ==
      Vector(Token("dokument", 1), Token("serveru", 4)))
  }

  test("Greek chain: lowercase fold (accents, final sigma), stops") {
    assert(IntlAnalyzers.greekFold("καλός") == "καλοσ")
    assert(Analyzers.tokenize(Analyzers.Greek,
      "Η θάλασσα είναι γαλάζια") ==
      Vector(Token("θαλασσα", 1), Token("γαλαζια", 3)))
  }

  test("Persian chain: arabic-char normalization then stops") {
    assert(IntlAnalyzers.persianNormalize("كتاب") == "کتاب")
    assert(Analyzers.tokenize(Analyzers.Persian,
      "این کتاب از کتابخانه") ==
      Vector(Token("کتاب", 1), Token("کتابخانه", 3)))
  }

  test("Thai chain: dictionary segmentation of Thai runs") {
    assert(Analyzers.tokenize(Analyzers.Thai,
      "สวัสดีครับผมชอบอ่านหนังสือ") ==
      Vector(Token("สวัสดี", 0), Token("ครับ", 1), Token("ผม", 2),
        Token("ชอบ", 3), Token("อ่าน", 4), Token("หนังสือ", 5)))
    // Latin text passes through with the English stop set
    assert(Analyzers.tokenize(Analyzers.Thai, "read the book") ==
      Vector(Token("read", 0), Token("book", 2)))
  }

  test("Arabic chain: normalization, light stemming, stops") {
    assert(IntlAnalyzers.arabicNormalize("أحمد") == "احمد")
    assert(IntlAnalyzers.arabicStem("الكتاب") == "كتاب")   // al- prefix
    assert(IntlAnalyzers.arabicStem("والكتاب") == "كتاب")  // wal- prefix
    assert(IntlAnalyzers.arabicStem("كتابها") == "كتاب")   // -ha suffix
    assert(Analyzers.tokenize(Analyzers.Arabic,
      "قرأ الطالب الكتاب في المكتبة") ==
      Vector(Token("قرا", 0), Token("طالب", 1), Token("كتاب", 2),
        Token("مكتب", 4))) // في(3) stopped; ة→ه then ه-suffix strips
  }
}
