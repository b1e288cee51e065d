package graft.services

import org.scalatest.funsuite.AnyFunSuite

/** The analyze-service long-poll (doc_intelligence.py:141-198 semantics). */
class PollSpec extends AnyFunSuite {

  private val sub = () => Right(Poll.Submitted(
    "https://svc/documentintelligence/analyzeResults/abc-123?api-version=x"))

  test("result id parses from Operation-Location") {
    assert(sub().toOption.get.resultId == "abc-123")
  }

  test("pending → pending → succeeded, sleeping before every probe") {
    var probes = 0
    var sleeps = 0
    val out = Poll.run[String](sub,
      _ => { probes += 1; if (probes < 3) Poll.Pending else Poll.Succeeded("analyzed") },
      intervalMs = 2000, sleeper = _ => sleeps += 1)
    assert(out == Right(("abc-123", "analyzed")))
    assert(probes == 3 && sleeps == 3, "the reference sleeps before the first probe too")
  }

  test("operation failure, probe exception, submit failure and timeout are Left values") {
    assert(Poll.run[String](sub, _ => Poll.Failed("quota"), sleeper = _ => ())
      == Left("Polling failed: quota"))
    assert(Poll.run[String](sub, _ => throw new RuntimeException("conn reset"),
      sleeper = _ => ()) == Left("Polling error: conn reset"))
    assert(Poll.run[String](() => Left("Bad response 403"), _ => Poll.Pending,
      sleeper = _ => ()) == Left("Bad response 403"))
    assert(Poll.run[String](sub, _ => Poll.Pending, maxPolls = 4, sleeper = _ => ())
      == Left("Polling timed out after 4 attempts"))
  }
}
