package graft.services

/** The submit → 202 → Operation-Location → poll-until-terminal pattern of
  * the reference's analysis services (SURVEY §3.1 step 4;
  * /root/reference/tools/doc_intelligence.py:141-198,
  * /root/reference/tools/content_understanding.py:122-197).
  *
  * Errors are VALUES, not exceptions — the reference accumulates them and
  * carries on per document, and so does every caller here. The sleeper is
  * injectable so specs drive the loop without wall-clock waits. Runs inside
  * executor tasks next to the client that owns the HTTP session.
  */
object Poll {

  /** Terminal outcome of one poll probe. */
  sealed trait Status[+T]
  /** Operation still running — poll again. */
  case object Pending extends Status[Nothing]
  final case class Succeeded[T](result: T) extends Status[T]
  final case class Failed(message: String) extends Status[Nothing]

  final case class Submitted(operationLocation: String) {
    /** `…/analyzeResults/<id>?api-version=…` → `<id>` (doc_intelligence.py:164). */
    def resultId: String =
      operationLocation.split('/').last.split('?').head
  }

  /** Submit, then poll every `intervalMs` until a terminal status or the
    * attempt budget runs out. Returns Right((resultId, value)) or
    * Left(error message) — submit failures, poll failures, operation
    * failure and timeout all land on the Left like the reference's
    * `errors` list.
    */
  def run[T](submit: () => Either[String, Submitted],
      probe: String => Status[T],
      intervalMs: Long = 2000,
      maxPolls: Int = 150,
      sleeper: Long => Unit = Thread.sleep): Either[String, (String, T)] = {
    submit() match {
      case Left(err) => Left(err)
      case Right(sub) =>
        var polls = 0
        while (polls < maxPolls) {
          sleeper(intervalMs) // the reference sleeps BEFORE the first probe
          polls += 1
          try {
            probe(sub.operationLocation) match {
              case Succeeded(v) => return Right((sub.resultId, v))
              case Failed(msg) => return Left(s"Polling failed: $msg")
              case Pending =>
            }
          } catch {
            case e: Exception => return Left(s"Polling error: ${e.getMessage}")
          }
        }
        Left(s"Polling timed out after $maxPolls attempts")
    }
  }
}
