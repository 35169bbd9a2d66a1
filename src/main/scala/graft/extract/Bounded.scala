package graft.extract

/** StringBuilder with the reference's max-text-length contract
  * (ExtractTextProcessor.java:81-86,174: `-1` = unlimited; otherwise the
  * extractor stops EARLY at the cap rather than truncating a fully
  * materialized string — "limit memory usage for dealing with large files").
  * Never splits a surrogate pair at the cut.
  */
final class Bounded(maxLen: Int) {
  private val sb = new java.lang.StringBuilder(if (maxLen > 0) math.min(maxLen, 1 << 16) else 1 << 12)

  def isFull: Boolean = maxLen >= 0 && sb.length >= maxLen

  /** Append as much of `s` as fits; returns false once full. */
  def append(s: CharSequence): Boolean = {
    if (maxLen < 0) { sb.append(s); true }
    else if (isFull) false
    else {
      val room = maxLen - sb.length
      if (s.length <= room) sb.append(s)
      else {
        var cut = room
        if (cut > 0 && Character.isHighSurrogate(s.charAt(cut - 1))) cut -= 1
        sb.append(s, 0, cut)
      }
      !isFull
    }
  }

  def append(c: Char): Boolean = append(String.valueOf(c))
  def length: Int = sb.length
  def result(): String = sb.toString
}
