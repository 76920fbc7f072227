package graft.functions

/** Byte-level tokenizer with EXACT `split(text, "\\s+")` (Java
  * `Pattern.split(..., -1)`) parity — the single source of truth for the
  * subtle edge rules shared by [[ShingleHashSet]] and [[SimHash64]]:
  *
  *  - whitespace class = the regex-\s ASCII set (trim() strips only ' ',
  *    so \t\n\x0B\f\r can survive at the edges),
  *  - an EMPTY token precedes leading whitespace and follows trailing
  *    whitespace,
  *  - the empty string yields ONE empty token (`"".split` → `[""]`).
  *
  * Multi-byte UTF-8 code points never contain ASCII bytes, so byte
  * scanning is safe on any input.
  */
private[functions] object SplitTokens {

  def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Token spans as (starts, ends, count); empty tokens have start == end. */
  def spans(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val len = bytes.length
    var nTok = 0
    var starts = new Array[Int](16); var ends = new Array[Int](16)
    def add(s: Int, e: Int): Unit = {
      if (nTok == starts.length) {
        starts = java.util.Arrays.copyOf(starts, nTok * 2)
        ends = java.util.Arrays.copyOf(ends, nTok * 2)
      }
      starts(nTok) = s; ends(nTok) = e; nTok += 1
    }
    if (len == 0) add(0, 0)
    else {
      if (isWs(bytes(0))) add(0, 0)
      var i = 0
      while (i < len) {
        while (i < len && isWs(bytes(i))) i += 1
        if (i < len) {
          val s = i
          while (i < len && !isWs(bytes(i))) i += 1
          add(s, i)
        }
      }
      if (isWs(bytes(len - 1))) add(len, len)
    }
    (starts, ends, nTok)
  }

  /** xxhash64 (seed 42) of each token's bytes, in token order. */
  def tokenHashes(bytes: Array[Byte]): Array[Long] = {
    val (starts, ends, n) = spans(bytes)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + starts(i),
        ends(i) - starts(i), 42L)
      i += 1
    }
    out
  }
}
