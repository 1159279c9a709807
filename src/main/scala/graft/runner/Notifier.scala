package graft.runner

/** Message sink — the reference's Slack webhook notifier
  * (`lib/slack.py:16-35,63-87`). The engine keeps the same surface
  * (sendmsg with entity escaping + hyperlink markup) behind a trait so
  * tests capture an outbox (mirrors the `slack_outbox` fixture,
  * `tests/conftest.py:86-93`).
  */
trait Notifier {
  def sendmsg(text: String): Unit
  def sendError(text: String): Unit = sendmsg(s"ERROR: $text")
}

object Notifier {
  /** Slack entity escaping (`lib/slack.py:23-35`): &, <, > only. */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Slack hyperlink markup (`lib/slack.py:79-87`). */
  def hyperlink(text: String, href: String): String =
    s"<${escape(href)}|${escape(text)}>"
}

final class ConsoleNotifier extends Notifier {
  def sendmsg(text: String): Unit = println(s"[notify] $text")
}

/** Captures messages for golden-output tests
  * (`tests/test_load_dataset.py:113-151` asserts exact sequences).
  */
final class RecordingNotifier extends Notifier {
  private val buf = collection.mutable.ArrayBuffer.empty[String]
  def sendmsg(text: String): Unit = buf += text
  def outbox: Seq[String] = buf.toSeq
  def clear(): Unit = buf.clear()
}
