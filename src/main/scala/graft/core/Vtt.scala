package graft.core

import scala.collection.mutable.ArrayBuffer

/** WebVTT transcript parsing + speaker-turn merge (SURVEY §2.9 C4, §2.5 A7).
  * Behavioral spec: /root/reference/chunking/chunkers/transcription_chunker.py:83-102
  * — parse cues, extract `<v Speaker>text</v>` voice spans, and fold
  * consecutive captions of the same speaker into single utterance lines.
  */
object Vtt {
  final case class Cue(startMs: Long, endMs: Long, voice: String, text: String)
  final case class Utterance(voice: String, text: String, startMs: Long, endMs: Long)

  private val TimeLine = """(?:(\d+):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*(?:(\d+):)?(\d{2}):(\d{2})\.(\d{3}).*""".r
  private val Voice = """<v\s+([^>]+)>(.*?)(?:</v>)?\s*$""".r

  private def ms(h: String, m: String, s: String, f: String): Long =
    (if (h == null) 0L else h.toLong) * 3600000L + m.toLong * 60000L + s.toLong * 1000L + f.toLong

  def parse(vtt: String): Seq[Cue] = {
    val out = ArrayBuffer.empty[Cue]
    val lines = vtt.split("\r?\n")
    var i = 0
    while (i < lines.length) {
      lines(i) match {
        case TimeLine(h1, m1, s1, f1, h2, m2, s2, f2) =>
          val start = ms(h1, m1, s1, f1); val end = ms(h2, m2, s2, f2)
          i += 1
          val text = ArrayBuffer.empty[String]
          while (i < lines.length && lines(i).trim.nonEmpty) { text += lines(i); i += 1 }
          text.mkString(" ").trim match {
            case Voice(v, t) => out += Cue(start, end, v.trim, t.trim)
            case t if t.nonEmpty => out += Cue(start, end, "", t)
            case _ =>
          }
        case _ => i += 1
      }
    }
    out.toSeq
  }

  /** Fold consecutive cues of the same voice into one utterance. */
  def mergeSpeakerTurns(cues: Seq[Cue]): Seq[Utterance] = {
    val out = ArrayBuffer.empty[Utterance]
    for (c <- cues) {
      if (out.nonEmpty && out.last.voice == c.voice) {
        val l = out.last
        out(out.length - 1) = l.copy(text = l.text + " " + c.text, endMs = c.endMs)
      } else out += Utterance(c.voice, c.text, c.startMs, c.endMs)
    }
    out.toSeq
  }

  /** Transcript rendered as "Speaker: utterance" lines (chunker input). */
  def toTranscript(vtt: String): String =
    mergeSpeakerTurns(parse(vtt))
      .map(u => if (u.voice.nonEmpty) s"${u.voice}: ${u.text}" else u.text)
      .mkString("\n")
}
