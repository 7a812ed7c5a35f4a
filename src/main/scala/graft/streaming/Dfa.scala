package graft.streaming

/** The reference's state machine (`state/dfa/State.java:23-93`),
  * re-expressed as a plain transition table:
  *
  * {{{
  *           +--[a]--> W --[b]--> Y --[e]---+
  *   Initial-+                    ^         +--> Z --[g]--> Terminal
  *           +--[c]--> X --[b]----+         |
  *                     |                    |
  *                     +--------[d]---------+
  * }}}
  *
  * `transition` returns None for an illegal (event, state) pair — the
  * reference's `InvalidTransition` (`State.java:84-93`).
  */
object Dfa {
  val Initial = "Initial"
  val Terminal = "Terminal"

  private val table: Map[(String, String), String] = Map(
    ("Initial", "a") -> "W",
    ("Initial", "c") -> "X",
    ("W", "b") -> "Y",
    ("X", "b") -> "Y",
    ("X", "d") -> "Z",
    ("Y", "e") -> "Z",
    ("Z", "g") -> Terminal)

  def transition(state: String, eventType: String): Option[String] =
    table.get((state, eventType))
}
