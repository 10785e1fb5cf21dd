package graft

/** Hashids — reversible obfuscated ids over non-negative longs, implemented
  * from the PUBLIC algorithm specification (hashids.org; the reference
  * wraps the npm `hashids` package for its HASHIDS IDFormat,
  * /root/reference/src/EncodeTools.ts:568-587). Deterministic for a given
  * (salt, minLength, alphabet), so encoded ids are stable across runs —
  * usable inside Dataset transforms, unlike the random id formats.
  */
final class Hashids(
    salt: String = "",
    minLength: Int = 0,
    alphabetIn: String = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ1234567890"
) extends Serializable {

  private val sepsIn = "cfhistuCFHISTU"
  private val (alphabet: String, seps: String, guards: String) = {
    var alpha = alphabetIn.distinct
    require(alpha.length >= 16, "hashids: alphabet must contain >= 16 unique chars")
    require(!alpha.contains(' '), "hashids: alphabet must not contain spaces")
    var seps0 = sepsIn.filter(alpha.contains(_))
    alpha = alpha.filterNot(seps0.contains(_))
    seps0 = consistentShuffle(seps0, salt)
    if (seps0.isEmpty || alpha.length.toDouble / seps0.length > 3.5) {
      var sepsLen = math.ceil(alpha.length / 3.5).toInt
      if (sepsLen > seps0.length) {
        val diff = sepsLen - seps0.length
        seps0 += alpha.take(diff)
        alpha = alpha.drop(diff)
      }
    }
    alpha = consistentShuffle(alpha, salt)
    val guardCount = math.ceil(alpha.length / 12.0).toInt
    if (alpha.length < 3) {
      val g = seps0.take(guardCount)
      (alpha, seps0.drop(guardCount), g)
    } else {
      val g = alpha.take(guardCount)
      (alpha.drop(guardCount), seps0, g)
    }
  }

  /** The published consistent-shuffle: a salt-keyed Fisher-Yates walk. */
  private def consistentShuffle(str: String, salt: String): String = {
    if (salt.isEmpty) return str
    val arr = str.toCharArray
    var v = 0
    var p = 0
    var i = arr.length - 1
    while (i > 0) {
      v %= salt.length
      val n = salt(v).toInt
      p += n
      val j = (n + v + p) % i
      val tmp = arr(j); arr(j) = arr(i); arr(i) = tmp
      v += 1
      i -= 1
    }
    new String(arr)
  }

  private def toBase(input: Long, alpha: String): String = {
    val sb = new StringBuilder
    var n = input
    val len = alpha.length
    while ({
      sb.insert(0, alpha((n % len).toInt))
      n /= len
      n > 0
    }) ()
    sb.toString
  }

  private def fromBase(hash: String, alpha: String): Long = {
    var n = 0L
    hash.foreach { c =>
      val d = alpha.indexOf(c)
      require(d >= 0, s"hashids: char '$c' not in alphabet")
      n = n * alpha.length + d
    }
    n
  }

  def encode(numbers: Long*): String = {
    require(numbers.nonEmpty && numbers.forall(_ >= 0), "hashids: non-negative inputs only")
    val numbersHash = numbers.zipWithIndex.map { case (n, i) => n % (i + 100) }.sum
    var alpha = alphabet
    val lottery = alpha((numbersHash % alpha.length).toInt)
    val sb = new StringBuilder(lottery.toString)
    numbers.zipWithIndex.foreach { case (num0, i) =>
      val buffer = lottery + salt + alpha
      alpha = consistentShuffle(alpha, buffer.take(alpha.length))
      val last = toBase(num0, alpha)
      sb.append(last)
      if (i + 1 < numbers.length) {
        val num = num0 % (last(0).toInt + i)
        sb.append(seps((num % seps.length).toInt))
      }
    }
    var result = sb.toString
    if (result.length < minLength) {
      var guardIndex = ((numbersHash + result(0).toInt) % guards.length).toInt
      result = guards(guardIndex) + result
      if (result.length < minLength) {
        guardIndex = ((numbersHash + result(2).toInt) % guards.length).toInt
        result += guards(guardIndex)
      }
      val halfLength = alpha.length / 2
      while (result.length < minLength) {
        alpha = consistentShuffle(alpha, alpha)
        result = alpha.drop(halfLength) + result + alpha.take(halfLength)
        val excess = result.length - minLength
        if (excess > 0) result = result.substring(excess / 2, excess / 2 + minLength)
      }
    }
    result
  }

  /** Fail-closed: a forged, foreign-salt, overflowing, or simply malformed
    * hash decodes to Seq.empty — never an exception (contract of the
    * published algorithm's decode+re-encode self-check).
    */
  def decode(hash: String): Seq[Long] =
    try {
      if (hash.isEmpty) return Seq.empty
      val inner = {
        val parts = hash.split(guards.map(c => java.util.regex.Pattern.quote(c.toString))
          .mkString("[", "", "]"), -1).filter(_.nonEmpty)
        if (parts.length == 2 || parts.length == 3) parts(1) else parts.headOption.getOrElse("")
      }
      if (inner.isEmpty) return Seq.empty
      val lottery = inner(0)
      val chunks = inner.drop(1).split(seps.map(c => java.util.regex.Pattern.quote(c.toString))
        .mkString("[", "", "]"), -1).filter(_.nonEmpty)
      var alpha = alphabet
      val out = chunks.map { chunk =>
        val buffer = lottery + salt + alpha
        alpha = consistentShuffle(alpha, buffer.take(alpha.length))
        fromBase(chunk, alpha)
      }.toSeq
      // the spec's self-check: a forged/foreign hash must not decode; an
      // overflowed chunk yields a negative that encode() rejects -> empty
      if (out.exists(_ < 0) || encode(out: _*) != hash) Seq.empty else out
    } catch {
      case _: IllegalArgumentException | _: StringIndexOutOfBoundsException => Seq.empty
    }

  def encodeHex(hex: String): String = {
    require(hex.matches("^[0-9a-fA-F]+$"), "hashids: invalid hex")
    // the published scheme: split into 12-nibble chunks, prefix nibble 1
    val nums = hex.grouped(12).map(c => java.lang.Long.parseLong("1" + c, 16)).toSeq
    encode(nums: _*)
  }

  def decodeHex(hash: String): String =
    decode(hash).map(n => java.lang.Long.toHexString(n).drop(1)).mkString
}
