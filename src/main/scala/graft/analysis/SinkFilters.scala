package graft.analysis

/** TeeSink family analog (contrib Sinks: `TeeSinkTokenFilter.cs:68` +
  * `DateRecognizerSinkFilter.cs`, `TokenRangeSinkFilter.cs`,
  * `TokenTypeSinkFilter.cs`): the reference tees one token stream into
  * sink streams, each gated by an `Accept(source)` predicate over the
  * shared attribute state. Spark-first, the tee is ONE [[Analyzers
  * .classicChain]] run per document fanned out into named filtered
  * views — the typed token (the TypeAttribute) and the stream ordinal
  * (the consumed-token count `TokenRangeSinkFilter` increments per
  * token it SEES — ordinals here count the chain's surviving tokens,
  * since the tee sits after the stop filter like a sink after its
  * upstream filters) are the whole attribute surface the three
  * reference sinks read. Each sink is a Serializable case class, so
  * the sweep distributes as a map-only pass. */
object SinkFilters {

  sealed trait Sink extends Serializable {
    def accept(t: Analyzers.TypedToken, ordinal: Int): Boolean
  }

  /** DateRecognizerSinkFilter analog — the reference accepts any term
    * the ambient culture's DateTime.Parse understands; this takes an
    * EXPLICIT pattern instead (deterministic and locale-free, the
    * sandbox-honest variant of the same predicate). */
  final case class DateSink(pattern: String = "uuuu-MM-dd") extends Sink {
    // STRICT resolution: a date RECOGNIZER must reject 2025-02-30;
    // the default SMART resolver would cap it to the month length.
    // Strict 'yyyy' (year-of-era) demands an era field, so a natural
    // user pattern like "yyyy-MM-dd" would silently match NOTHING —
    // normalize unquoted 'y' runs to 'u' (proleptic year) so custom
    // patterns behave the way their authors mean.
    private def normalized: String = {
      val sb = new StringBuilder; var quoted = false
      pattern.foreach { c =>
        if (c == '\'') { quoted = !quoted; sb += c }
        else sb += (if (c == 'y' && !quoted) 'u' else c)
      }
      sb.result()
    }
    @transient private lazy val fmt =
      java.time.format.DateTimeFormatter.ofPattern(normalized)
        .withResolverStyle(java.time.format.ResolverStyle.STRICT)
    // fail at CONSTRUCTION, not silently at match time: a known-good
    // date must round-trip through the pattern or the sink is a
    // dead-end (e.g. a time-field pattern can never parse a LocalDate)
    require({
      val probe = java.time.LocalDate.of(2000, 1, 15)
      java.time.LocalDate.parse(probe.format(fmt), fmt) == probe
    }, s"DateSink pattern '$pattern' cannot round-trip a LocalDate")
    def accept(t: Analyzers.TypedToken, ordinal: Int): Boolean =
      try { java.time.LocalDate.parse(t.term, fmt); true }
      catch { case _: java.time.format.DateTimeParseException => false }
  }

  /** TokenRangeSinkFilter analog: stream ordinal in [lower, upper). */
  final case class TokenRangeSink(lower: Int, upper: Int) extends Sink {
    def accept(t: Analyzers.TypedToken, ordinal: Int): Boolean =
      ordinal >= lower && ordinal < upper
  }

  /** TokenTypeSinkFilter analog: the token's type tag matches. */
  final case class TokenTypeSink(tpe: Analyzers.TokenType) extends Sink {
    def accept(t: Analyzers.TypedToken, ordinal: Int): Boolean =
      t.tpe == tpe
  }

  /** One analysis, every sink's view: (sink name, stream ordinal,
    * token) for each sink that accepts the token. */
  def tee(text: String, sinks: Seq[(String, Sink)])
      : Vector[(String, Int, Analyzers.TypedToken)] =
    Analyzers.classicChain(text).zipWithIndex.flatMap { case (t, ord) =>
      sinks.collect { case (name, s) if s.accept(t, ord) =>
        (name, ord, t) }
    }
}
