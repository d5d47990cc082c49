package graft.operators

import scala.collection.mutable.ArrayBuffer

/** SubRip (.srt) subtitle build + parse — the caption sidecar format
  * video training sets ship with (cue text aligned to time ranges).
  * Blocks are `index\ntimestamps\ntext…` separated by blank lines;
  * timestamps are `HH:MM:SS,mmm --> HH:MM:SS,mmm`. The parser is
  * strict-but-skipping like the other container walks: a malformed
  * block (bad index, bad time line, negative range) is dropped
  * without inventing cues, and the walk continues at the next blank
  * line — real subtitle files arrive with broken blocks.
  *
  * Deterministic both ways (no locale, no float), so tests and
  * oracles predict every byte. */
object Srt {

  final case class SrtCue(idx: Int, startMs: Long, endMs: Long,
                          text: String)

  private def fmtTs(ms: Long): String = {
    val h = ms / 3600000
    val m = ms / 60000 % 60
    val s = ms / 1000 % 60
    val f = ms % 1000
    f"$h%02d:$m%02d:$s%02d,$f%03d"
  }

  /** Render cues as a standard .srt document (1-based indices,
    * CRLF-free — plain \n, which every SRT reader accepts). */
  def build(cues: Seq[(Long, Long, String)]): String =
    cues.zipWithIndex.map { case ((s, e, t), i) =>
      s"${i + 1}\n${fmtTs(s)} --> ${fmtTs(e)}\n$t"
    }.mkString("", "\n\n", "\n")

  private val TsRe =
    """(\d\d):(\d\d):(\d\d),(\d\d\d) --> (\d\d):(\d\d):(\d\d),(\d\d\d)""".r

  private def ms(h: String, m: String, s: String, f: String): Long =
    h.toLong * 3600000 + m.toLong * 60000 + s.toLong * 1000 + f.toLong

  /** Parse an .srt document to its valid cues. Never throws. */
  def parse(srt: String): Seq[SrtCue] = {
    val out = ArrayBuffer.empty[SrtCue]
    // blocks split on blank lines; tolerate \r\n files
    val blocks = srt.replace("\r\n", "\n").split("\n\n+")
    for (b <- blocks) {
      val lines = b.split("\n").dropWhile(_.isEmpty)
      if (lines.length >= 2) {
        (lines(0).trim.toIntOption, lines(1).trim) match {
          case (Some(idx), TsRe(h1, m1, s1, f1, h2, m2, s2, f2))
              if idx > 0 =>
            val st = ms(h1, m1, s1, f1)
            val en = ms(h2, m2, s2, f2)
            if (en >= st)
              out += SrtCue(idx, st, en,
                lines.drop(2).mkString("\n"))
          case _ => // malformed block: skip, never invent
        }
      }
    }
    out.toSeq
  }
}
