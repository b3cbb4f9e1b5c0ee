package graft.parse

/** Deterministic restatement of the reference's LLM HTML-format validator
  * (gemini_corrector.py:568–627 `verify_html_formatting`).
  *
  * The reference sends the page HTML to Gemini with a prompt asking for five
  * issue lists (alignment / spacing / borderless-table / font-size / bold),
  * an `overall_score` 0–100 and a `needs_correction` flag, JSON-only output.
  * The LLM boundary is out of scope here (SURVEY.md §0), so this is the
  * deterministic lint the rebuild scores to the SAME JSON shape: each of the
  * five reference categories is restated as structural checks against the
  * emitter dialect this engine produces (SPEC.md §7b — `align-*`/`indented`/
  * `size-*` classed text lines, `empty-line` spacer divs, `ocr-table`/
  * `invisible-table` grids with first-row `<th>`, `<strong>` bold runs):
  *
  *  1. alignment_issues  — conflicting/unknown `align-*` classes and
  *     unclosed/mismatched block tags (the structural analog of "misaligned
  *     elements" — a broken tree renders misaligned). `indented` is
  *     deliberately NOT cross-checked against alignment: the emitter treats
  *     indent and alignment as orthogonal (PageParser.scala text-line class
  *     assembly), so any combination is legitimate output.
  *  2. spacing_issues    — an `empty-line` div that carries content, and runs
  *     of more than 5 consecutive `empty-line` divs (`Style.emptyLines` caps
  *     emission at 5 — html_generator.py:378–406 — so a longer run cannot be
  *     legitimate emitter output).
  *  3. table_issues      — zero-row tables, ragged rows (differing cell
  *     counts), header cells after the first row / body cells in the header
  *     row (mdTableToHtml makes row 0 all-`<th>`, the rest all-`<td>`),
  *     cells outside a row, rows outside a table, classless tables.
  *  4. font_size_issues  — unknown or multiple `size-*` classes (the emitter
  *     assigns at most one of size-xlarge/size-large/size-small), and a
  *     heading tag carrying `size-small` (title demoted to footnote size).
  *  5. bold_issues       — unbalanced/nested/empty `<strong>`/`<b>` runs and
  *     bold inside a heading tag (headings are already emphasized; the
  *     emitter never double-bolds).
  *
  * Scoring is the documented deterministic rule: every issue costs 5 points
  * from 100 (floored at 0) and `needs_correction` is true iff any issue
  * fired. `toJson` emits the exact key order of the reference prompt's
  * output contract.
  */
object HtmlVerify {

  final case class Report(
      alignmentIssues: Seq[String],
      spacingIssues: Seq[String],
      tableIssues: Seq[String],
      fontSizeIssues: Seq[String],
      boldIssues: Seq[String]) {
    def total: Int =
      alignmentIssues.size + spacingIssues.size + tableIssues.size +
        fontSizeIssues.size + boldIssues.size
    def overallScore: Int = math.max(0, 100 - 5 * total)
    def needsCorrection: Boolean = total > 0

    /** JSON in the reference output contract's key order
      * (gemini_corrector.py:600–609).
      */
    def toJson: String = {
      def arr(xs: Seq[String]) = xs.map(jsonStr).mkString("[", ",", "]")
      s"""{"alignment_issues":${arr(alignmentIssues)},""" +
        s""""spacing_issues":${arr(spacingIssues)},""" +
        s""""table_issues":${arr(tableIssues)},""" +
        s""""font_size_issues":${arr(fontSizeIssues)},""" +
        s""""bold_issues":${arr(boldIssues)},""" +
        s""""overall_score":$overallScore,""" +
        s""""needs_correction":$needsCorrection}"""
    }
  }

  private def jsonStr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  // ---- tag stream ----------------------------------------------------------

  private sealed trait Ev
  private final case class Open(name: String, classes: Seq[String], selfClose: Boolean) extends Ev
  private final case class Close(name: String) extends Ev
  private final case class Text(s: String) extends Ev

  /** Comments consume everything to `-->` (a tag inside a comment is not
    * markup); non-comment tags allow `>` inside quoted attribute values.
    */
  private val TagRe =
    "(?s)<!--.*?-->|<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>".r
  private val ClassRe = "class\\s*=\\s*\"([^\"]*)\"".r
  /** Void elements never take a close tag (HTML spec; the emitter uses img). */
  private val Void = Set("img", "br", "hr", "meta", "link", "input")

  private def lex(html: String): Vector[Ev] = {
    val out = Vector.newBuilder[Ev]
    var last = 0
    for (m <- TagRe.findAllMatchIn(html)) {
      if (m.start > last) out += Text(html.substring(last, m.start))
      if (m.group(2) != null) { // null group 2 = a comment: not markup, not text
        val name = m.group(2).toLowerCase
        if (m.group(1) == "/") out += Close(name)
        else {
          val raw = m.group(3)
          val classes = ClassRe.findFirstMatchIn(raw)
            .map(_.group(1).trim.split("\\s+").toSeq.filter(_.nonEmpty))
            .getOrElse(Seq.empty)
          // the greedy attribute group swallows a trailing '/' (group 4 can
          // only match when the attrs group is empty), so XML-style
          // self-closes are detected off the raw attr text; a quoted value
          // can't end the group with '/' (it ends with its quote char)
          val selfSlash = m.group(4) == "/" || raw.trim.endsWith("/")
          out += Open(name, classes, selfSlash || Void(name))
        }
      }
      last = m.end
    }
    if (last < html.length) out += Text(html.substring(last))
    out.result()
  }

  private val BoldTags = Set("strong", "b")
  private val TableTags = Set("table", "tr", "td", "th")
  private val HeadingTags = Set("h1", "h2", "h3")

  // ---- the lint -------------------------------------------------------------

  def verify(html: String): Report = {
    val alignment = Seq.newBuilder[String]
    val spacing   = Seq.newBuilder[String]
    val table     = Seq.newBuilder[String]
    val fontSize  = Seq.newBuilder[String]
    val bold      = Seq.newBuilder[String]

    // route a structural (balance) issue to its reference category
    def structural(tag: String, msg: String): Unit =
      if (BoldTags(tag)) bold += msg
      else if (TableTags(tag)) table += msg
      else alignment += msg

    val evs = lex(html)

    // ---- class checks on every opened element -----------------------------
    evs.foreach {
      case Open(name, classes, _) =>
        val aligns = classes.filter(_.startsWith("align-"))
        if (aligns.size > 1)
          alignment += s"conflicting alignment classes on <$name>: ${aligns.mkString(" ")}"
        aligns.map(_.stripPrefix("align-"))
          .filterNot(Set("left", "center", "right")).foreach { v =>
            alignment += s"unknown alignment '$v' on <$name>"
          }
        val sizes = classes.filter(_.startsWith("size-"))
        if (sizes.size > 1)
          fontSize += s"multiple size classes on <$name>: ${sizes.mkString(" ")}"
        sizes.map(_.stripPrefix("size-"))
          .filterNot(Set("xlarge", "large", "small")).foreach { v =>
            fontSize += s"unknown size '$v' on <$name>"
          }
        if (HeadingTags(name) && sizes.contains("size-small"))
          fontSize += s"heading <$name> rendered size-small"
        if (name == "table" && classes.isEmpty)
          table += "classless <table>"
      case _ => ()
    }

    // ---- single pass: balance, bold runs, empty-line runs, table shape -----
    var stack = List.empty[Open]
    // one hasText flag per open bold level: a single boolean would be reset
    // by a nested open and falsely flag the outer run as empty
    var boldText = List.empty[Boolean]
    def boldDepth = boldText.size
    var emptyRun = 0
    def flushEmptyRun(): Unit = {
      if (emptyRun > 5)
        spacing += s"$emptyRun consecutive empty-line divs (emitter max 5)"
      emptyRun = 0
    }
    // innermost open table: row cell-counts + per-row th/td mix
    var tableRows = List.empty[Vector[(Int, Boolean)]] // per open table: (cells, sawTh) per closed row
    var rowCells = -1      // cells in the currently open row; -1 = no open row
    var rowSawTh = false
    var rowSawTd = false

    def inTable = tableRows.nonEmpty

    evs.foreach {
      case ev @ Open(name, classes, selfClose) =>
        val isEmptyLine = name == "div" && classes.contains("empty-line")
        if (!isEmptyLine) flushEmptyRun()
        if (BoldTags(name)) {
          if (boldDepth > 0) bold += s"nested <$name> inside bold run"
          boldText = false :: boldText
        }
        if (HeadingTags(name) && boldDepth > 0)
          bold += s"bold wrapping heading <$name>"
        name match {
          case "table" =>
            tableRows = Vector.empty[(Int, Boolean)] :: tableRows
          case "tr" =>
            if (!inTable) table += "<tr> outside a table"
            else { rowCells = 0; rowSawTh = false; rowSawTd = false }
          case "td" | "th" =>
            if (!inTable || rowCells < 0) table += s"<$name> outside a table row"
            else {
              rowCells += 1
              if (name == "th") rowSawTh = true else rowSawTd = true
            }
          case "strong" | "b" if HeadingTags.exists(h => stack.exists(_.name == h)) =>
            bold += s"bold inside heading"
          case _ => ()
        }
        if (!selfClose) stack = ev :: stack

      case Close(name) =>
        if (!(name == "div" && stack.headOption.exists(o =>
              o.name == "div" && o.classes.contains("empty-line"))))
          flushEmptyRun()
        stack.headOption match {
          case Some(top) if top.name == name =>
            if (name == "div" && top.classes.contains("empty-line")) emptyRun += 1
            if (BoldTags(name)) {
              if (!boldText.head) bold += s"empty <$name></$name>"
              boldText = boldText.tail
            }
            name match {
              case "tr" =>
                if (rowCells >= 0) {
                  if (rowCells == 0) table += "row with no cells"
                  tableRows = (tableRows.head :+ ((rowCells, rowSawTh))) :: tableRows.tail
                  // header/body discipline checked at table close (needs row index)
                  if (rowSawTh && rowSawTd) table += "mixed th/td row"
                  rowCells = -1
                }
              case "table" =>
                val rows = tableRows.head
                tableRows = tableRows.tail
                if (rows.isEmpty) table += "table with no rows"
                else {
                  val counts = rows.map(_._1)
                  if (counts.distinct.size > 1)
                    table += s"ragged table rows (${counts.min}..${counts.max} cells)"
                  rows.zipWithIndex.foreach { case ((_, sawTh), i) =>
                    if (i == 0 && !sawTh) table += "header row without <th>"
                    if (i > 0 && sawTh) table += s"<th> in body row ${i + 1}"
                  }
                }
              case _ => ()
            }
            stack = stack.tail
          case Some(top) =>
            structural(name, s"mismatched </$name>, expected </${top.name}>")
            // recover: drop through to the matching open if present
            val idx = stack.indexWhere(_.name == name)
            if (idx >= 0) {
              val dropped = stack.take(idx + 1)
              stack.take(idx).foreach(o => structural(o.name, s"unclosed <${o.name}>"))
              // keep the auxiliary state machines aligned with the stack:
              // pop one bold flag per dropped bold tag, one tableRows entry
              // per dropped table (its rows are discarded — the table is
              // already flagged unclosed/mismatched), and reset the open-row
              // counters if a <tr> was dropped so later cells don't
              // accumulate into a stale row
              boldText = boldText.drop(dropped.count(o => BoldTags(o.name)))
              dropped.foreach { o =>
                if (o.name == "table" && tableRows.nonEmpty)
                  tableRows = tableRows.tail
              }
              if (dropped.exists(_.name == "tr")) {
                rowCells = -1; rowSawTh = false; rowSawTd = false
              }
              stack = stack.drop(idx + 1)
            }
          case None =>
            structural(name, s"stray </$name> with nothing open")
        }

      case Text(s) =>
        if (s.trim.nonEmpty) {
          flushEmptyRun()
          // the text sits inside every open bold run, not just the innermost
          if (boldText.nonEmpty) boldText = boldText.map(_ => true)
          if (stack.headOption.exists(o =>
              o.name == "div" && o.classes.contains("empty-line")))
            spacing += "empty-line div contains text"
        }
    }
    flushEmptyRun()
    stack.foreach(o => structural(o.name, s"unclosed <${o.name}>"))

    Report(alignment.result(), spacing.result(), table.result(),
      fontSize.result(), bold.result())
  }
}
