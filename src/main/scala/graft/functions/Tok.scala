package graft.functions

/** JVM-side mirror of the engine's shared tokenizer
  * (`graft.clean.CleanFns.tokens`: split on whitespace runs, drop empty
  * tokens) for the native codegen expressions. One definition feeds both
  * `MinHashBands` and `SimHash32` so the native signatures cannot drift
  * from the declarative generators they are verified against.
  */
object Tok {

  /** Exactly `filter(split(s, '\\s+'), t -> length(t) > 0)`:
    * `String.split("\\s+")` already drops trailing empty fields (limit 0)
    * and can only leave one leading empty field (input starting with
    * whitespace), which is stripped here. An empty/all-whitespace input
    * yields an empty array.
    */
  def split(s: String): Array[String] = {
    val raw = s.split("\\s+")
    if (raw.nonEmpty && raw(0).isEmpty) java.util.Arrays.copyOfRange(raw, 1, raw.length)
    else raw
  }
}
