package graft.analysis

/** WordlistLoader analogs (`src/core/Analysis/WordlistLoader.cs:25`):
  * parse user-supplied word-list / stem-dictionary text into the shapes
  * the analyzer wrappers take ([[Analyzers.CustomStops]],
  * [[Analyzers.StemAdjusted]]). Pure string → collection functions — the
  * caller owns I/O, so the same parser serves files, resources, and
  * broadcast corpora. */
object WordLists {

  @inline private def lines(content: String): Seq[String] =
    content.replace("﻿", "").split('\n').toSeq
      .map(_.trim).filter(_.nonEmpty)

  /** One word per line, trimmed; lines starting with `comment` skipped
    * when a comment prefix is given (GetWordSet overloads). */
  def wordSet(content: String, comment: String = ""): Set[String] =
    lines(content)
      .filter(l => comment.isEmpty || !l.startsWith(comment))
      .toSet

  /** TAB-separated word/stem pairs; only the FIRST tab splits, so a
    * stem containing tabs survives intact (GetStemDict's 2-limit). A
    * line with an EMPTY stem (trailing tab) is dropped — an
    * empty-string override would emit empty index terms downstream. */
  def stemDict(content: String): Map[String, String] =
    lines(content).flatMap { l =>
      l.split("\t", 2) match {
        case Array(w, s) if s.trim.nonEmpty => Some(w.trim -> s.trim)
        case _ => None
      }
    }.toMap
}
