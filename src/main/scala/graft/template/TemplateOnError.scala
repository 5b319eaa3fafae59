package graft.template

/** `on-error()` mode parsing (`lib/template/templates.h:46-52`,
  * `log_template_on_error_parse` templates.c): three base modes, each
  * with a `silently-` variant OR-ing the silent bit; a null mode
  * defaults to drop-message; anything else is a config-time error.
  * The flag VALUES are part of the surface (scl configs compare them,
  * the battery asserts the arithmetic). */
object TemplateOnError {
  val DropMessage = 0x01
  val DropProperty = 0x02
  val FallbackToString = 0x04
  val Silent = 0x08

  /** log_template_on_error_parse: Some(flags) or None for unknown. */
  def parse(mode: String): Option[Int] = {
    if (mode == null) return Some(DropMessage)
    val silently = mode.startsWith("silently-")
    val bare = if (silently) mode.substring("silently-".length) else mode
    val base = bare match {
      case "drop-message" => DropMessage
      case "drop-property" => DropProperty
      case "fallback-to-string" => FallbackToString
      case _ => return None
    }
    Some(if (silently) base | Silent else base)
  }
}
