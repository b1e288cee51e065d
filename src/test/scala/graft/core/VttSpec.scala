package graft.core

import org.scalatest.funsuite.AnyFunSuite

class VttSpec extends AnyFunSuite {
  private val sample =
    """WEBVTT
      |
      |1
      |00:00:00.000 --> 00:00:04.000
      |<v Alice>Hello everyone.</v>
      |
      |2
      |00:00:04.000 --> 00:00:07.500
      |<v Alice>Welcome to the meeting.</v>
      |
      |3
      |00:00:07.500 --> 00:00:12.000
      |<v Bob>Thanks Alice.</v>
      |
      |4
      |00:00:12.000 --> 00:00:15.000
      |<v Alice>Let's begin.</v>
      |""".stripMargin

  test("parse extracts cues with voices and times") {
    val cues = Vtt.parse(sample)
    assert(cues.size == 4)
    assert(cues.head.voice == "Alice")
    assert(cues.head.text == "Hello everyone.")
    assert(cues.head.startMs == 0 && cues.head.endMs == 4000)
    assert(cues(2).voice == "Bob")
  }

  test("mergeSpeakerTurns folds consecutive same-voice cues (A7)") {
    val utts = Vtt.mergeSpeakerTurns(Vtt.parse(sample))
    assert(utts.size == 3)
    assert(utts.head.voice == "Alice")
    assert(utts.head.text == "Hello everyone. Welcome to the meeting.")
    assert(utts.head.startMs == 0 && utts.head.endMs == 7500)
    assert(utts(1).voice == "Bob")
    assert(utts(2).voice == "Alice")
  }

  test("toTranscript renders speaker-prefixed lines") {
    val t = Vtt.toTranscript(sample)
    assert(t == "Alice: Hello everyone. Welcome to the meeting.\nBob: Thanks Alice.\nAlice: Let's begin.")
  }

  test("hour-long timestamps and voiceless cues") {
    val v = "WEBVTT\n\n1:02:03.250 --> 1:02:05.000\nplain caption\n"
    val cues = Vtt.parse(v)
    assert(cues.size == 1)
    assert(cues.head.startMs == 3723250L)
    assert(cues.head.voice == "")
  }
}
