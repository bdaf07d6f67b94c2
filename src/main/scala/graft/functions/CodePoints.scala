package graft.functions

/** Code-point offset table for UTF-16 Java strings, shared by the n-gram
  * generators. Spark string builtins (substring/length via UTF8String) count
  * code points, so any generator claiming set-equivalence with the Column
  * forms must window by code point too — indexing a Java String directly
  * counts UTF-16 units and splits surrogate pairs on supplementary-plane
  * text (emoji, rare CJK), emitting invalid lone-surrogate tokens.
  */
private[functions] object CodePoints {

  /** `starts(i)` = UTF-16 offset of the i-th code point; `starts(n)` =
    * `s.length` for n code points, so the i..i+k code-point window is
    * `s.substring(starts(i), starts(i + k))`.
    */
  def starts(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val offsets = new Array[Int](n + 1)
    var o = 0
    var i = 0
    while (i < n) {
      offsets(i) = o
      o = s.offsetByCodePoints(o, 1)
      i += 1
    }
    offsets(n) = s.length
    offsets
  }
}
