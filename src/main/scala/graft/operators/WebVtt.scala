package graft.operators

import scala.collection.mutable.ArrayBuffer

/** WebVTT (.vtt) caption build + parse — the W3C sibling of [[Srt]]
  * and the format web-scraped caption tracks actually arrive in
  * (YouTube exports, HTML5 `<track>` files). Differences from SRT
  * that matter to a parser: a mandatory `WEBVTT` signature line
  * (optional BOM, optional trailing title), `.` instead of `,`
  * before the milliseconds, OPTIONAL hours, an OPTIONAL cue
  * identifier line (any line without `-->`), cue SETTINGS after the
  * end timestamp (`position:… align:…`), and non-cue blocks (NOTE /
  * STYLE / REGION) interleaved with cues.
  *
  * Parse is strict-but-skipping like the other container walks: a
  * malformed timing line drops its block without inventing cues and
  * the walk continues at the next blank line; a missing signature
  * rejects the whole document (it is the format's magic). Never
  * throws. Deterministic both ways — no locale, no float. */
object WebVtt {

  final case class VttCue(id: String, startMs: Long, endMs: Long,
                          settings: String, text: String)

  private def fmtTs(ms: Long): String = {
    val h = ms / 3600000
    val m = ms / 60000 % 60
    val s = ms / 1000 % 60
    val f = ms % 1000
    f"$h%02d:$m%02d:$s%02d.$f%03d"
  }

  /** Render cues as a standard .vtt document. Empty id/settings are
    * omitted, as the spec allows. */
  def build(cues: Seq[(String, Long, Long, String, String)]): String = {
    val blocks = cues.map { case (id, s, e, settings, text) =>
      val idLine = if (id.isEmpty) "" else s"$id\n"
      val setSuffix = if (settings.isEmpty) "" else s" $settings"
      s"$idLine${fmtTs(s)} --> ${fmtTs(e)}$setSuffix\n$text"
    }
    blocks.mkString("WEBVTT\n\n", "\n\n", "\n")
  }

  // HH is optional and may exceed 2 digits per spec; MM and SS are
  // exactly 2; millis exactly 3 after '.'
  private val TsRe = """(?:(\d{2,}):)?(\d\d):(\d\d)\.(\d\d\d)""".r
  private val CueRe =
    ("""\s*((?:\d{2,}:)?\d\d:\d\d\.\d\d\d)""" +
      """ --> ((?:\d{2,}:)?\d\d:\d\d\.\d\d\d)[ \t]*(.*)""").r

  private def ms(t: String): Option[Long] = t match {
    case TsRe(h, m, s, f) =>
      val mm = m.toLong
      val ss = s.toLong
      if (mm > 59 || ss > 59) None
      else Some(Option(h).map(_.toLong * 3600000).getOrElse(0L) +
        mm * 60000 + ss * 1000 + f.toLong)
    case _ => None
  }

  /** Parse a .vtt document to its valid cues. None when the WEBVTT
    * signature is missing (not a VTT file); malformed cue blocks and
    * NOTE/STYLE/REGION blocks are skipped. */
  def parse(vtt: String): Option[Seq[VttCue]] = {
    var body = vtt.replace("\r\n", "\n").replace("\r", "\n")
    if (body.startsWith("\ufeff")) body = body.substring(1)
    if (!body.startsWith("WEBVTT")) return None
    val afterSig = body.substring(6)
    // signature line may carry a space/tab + title, nothing else
    if (afterSig.nonEmpty && afterSig(0) != '\n' && afterSig(0) != ' ' &&
      afterSig(0) != '\t') return None
    val blocks = body.split("\n\n+").drop(1) // drop the header block
    val out = ArrayBuffer.empty[VttCue]
    for (b <- blocks) {
      val lines = b.split("\n").dropWhile(_.isEmpty)
      if (lines.nonEmpty && !lines(0).startsWith("NOTE") &&
        !lines(0).startsWith("STYLE") && !lines(0).startsWith("REGION")) {
        // optional id line: first line without "-->"
        val (id, rest) =
          if (lines(0).contains("-->")) ("", lines)
          else (lines(0).trim, lines.drop(1))
        if (rest.nonEmpty) rest(0) match {
          case CueRe(st, en, settings) =>
            (ms(st), ms(en)) match {
              case (Some(s), Some(e)) if e >= s =>
                out += VttCue(id, s, e, settings.trim,
                  rest.drop(1).mkString("\n"))
              case _ => // bad range: skip
            }
          case _ => // malformed block: skip, never invent
        }
      }
    }
    Some(out.toSeq)
  }
}
