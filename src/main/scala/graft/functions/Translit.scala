package graft.functions

/**
 * Table-driven transliteration of the alphabetic/syllabic non-Latin
 * scripts to ASCII — the main body of the reference's dormant
 * `unidecode` step (reference: src/data/preprocess.py:13-17) that the
 * plain NFKD fold cannot express. Schemes are the PUBLIC standard
 * romanizations, not unidecode's data files (whose tables are not
 * copied): modern-Greek ELOT-like letters, BGN/PCGN-like Cyrillic,
 * Hepburn kana (with digraphs きゃ→kya/しゃ→sha, small-vowel
 * combination ヴォ→vo, sokuon gemination きっと→kitto, and the
 * katakana long-vowel mark repeating the previous vowel). Unmapped
 * codepoints (notably Han ideographs — unidecode's readings tables are
 * far larger than this engine wants to carry) pass through unchanged,
 * preserving the previous behavior for them.
 *
 * Input contract: call on NFKD-decomposed text whose combining marks
 * are stripped EXCEPT the kana voicing marks U+3099/U+309A, then
 * NFC-recomposed — accents are gone from Greek/Cyrillic/Latin before
 * lookup while が/ぱ arrive precomposed (see
 * [[PyTextStatics.normalizeAscii]] for the full pipeline).
 */
object Translit {

  private def withUpper(m: Map[Char, String]): Map[Char, String] =
    m ++ m.map { case (c, r) =>
      Character.toUpperCase(c) ->
        (if (r.isEmpty) r else r.head.toUpper +: r.tail)
    }.filter { case (c, _) => !m.contains(c) }

  private val greek: Map[Char, String] = withUpper(Map(
    'α' -> "a", 'β' -> "v", 'γ' -> "g", 'δ' -> "d", 'ε' -> "e",
    'ζ' -> "z", 'η' -> "i", 'θ' -> "th", 'ι' -> "i", 'κ' -> "k",
    'λ' -> "l", 'μ' -> "m", 'ν' -> "n", 'ξ' -> "x", 'ο' -> "o",
    'π' -> "p", 'ρ' -> "r", 'σ' -> "s", 'ς' -> "s", 'τ' -> "t",
    'υ' -> "y", 'φ' -> "f", 'χ' -> "ch", 'ψ' -> "ps", 'ω' -> "o"))

  private val cyrillic: Map[Char, String] = withUpper(Map(
    'а' -> "a", 'б' -> "b", 'в' -> "v", 'г' -> "g", 'д' -> "d",
    'е' -> "e", 'ж' -> "zh", 'з' -> "z", 'и' -> "i", 'й' -> "i",
    'к' -> "k", 'л' -> "l", 'м' -> "m", 'н' -> "n", 'о' -> "o",
    'п' -> "p", 'р' -> "r", 'с' -> "s", 'т' -> "t", 'у' -> "u",
    'ф' -> "f", 'х' -> "kh", 'ц' -> "ts", 'ч' -> "ch", 'ш' -> "sh",
    'щ' -> "shch", 'ъ' -> "", 'ы' -> "y", 'ь' -> "", 'э' -> "e",
    'ю' -> "yu", 'я' -> "ya",
    // common non-Russian Cyrillic
    'і' -> "i", 'ї' -> "yi", 'є' -> "ye", 'ґ' -> "g", 'ў' -> "u",
    'ђ' -> "dj", 'љ' -> "lj", 'њ' -> "nj", 'ћ' -> "c", 'џ' -> "dz"))

  /** Hiragana base syllables (katakana is normalized to hiragana by the
    * U+0060 block offset before lookup). */
  private val kana: Map[Char, String] = Map(
    'あ' -> "a", 'い' -> "i", 'う' -> "u", 'え' -> "e", 'お' -> "o",
    'か' -> "ka", 'き' -> "ki", 'く' -> "ku", 'け' -> "ke", 'こ' -> "ko",
    'さ' -> "sa", 'し' -> "shi", 'す' -> "su", 'せ' -> "se", 'そ' -> "so",
    'た' -> "ta", 'ち' -> "chi", 'つ' -> "tsu", 'て' -> "te", 'と' -> "to",
    'な' -> "na", 'に' -> "ni", 'ぬ' -> "nu", 'ね' -> "ne", 'の' -> "no",
    'は' -> "ha", 'ひ' -> "hi", 'ふ' -> "fu", 'へ' -> "he", 'ほ' -> "ho",
    'ま' -> "ma", 'み' -> "mi", 'む' -> "mu", 'め' -> "me", 'も' -> "mo",
    'や' -> "ya", 'ゆ' -> "yu", 'よ' -> "yo",
    'ら' -> "ra", 'り' -> "ri", 'る' -> "ru", 'れ' -> "re", 'ろ' -> "ro",
    'わ' -> "wa", 'ゐ' -> "wi", 'ゑ' -> "we", 'を' -> "wo", 'ん' -> "n",
    'が' -> "ga", 'ぎ' -> "gi", 'ぐ' -> "gu", 'げ' -> "ge", 'ご' -> "go",
    'ざ' -> "za", 'じ' -> "ji", 'ず' -> "zu", 'ぜ' -> "ze", 'ぞ' -> "zo",
    'だ' -> "da", 'ぢ' -> "ji", 'づ' -> "zu", 'で' -> "de", 'ど' -> "do",
    'ば' -> "ba", 'び' -> "bi", 'ぶ' -> "bu", 'べ' -> "be", 'ぼ' -> "bo",
    'ぱ' -> "pa", 'ぴ' -> "pi", 'ぷ' -> "pu", 'ぺ' -> "pe", 'ぽ' -> "po",
    'ゔ' -> "vu",
    'ぁ' -> "a", 'ぃ' -> "i", 'ぅ' -> "u", 'ぇ' -> "e", 'ぉ' -> "o",
    'ゕ' -> "ka", 'ゖ' -> "ke") // small ka/ke (counters), incl. ヵ/ヶ folded

  private val smallY = Map('ゃ' -> "ya", 'ゅ' -> "yu", 'ょ' -> "yo")
  private val smallVowel = Set('ぁ', 'ぃ', 'ぅ', 'ぇ', 'ぉ')

  /** Katakana (incl. ヴ and small forms) -> hiragana twin; everything
    * else unchanged. The prolonged-sound mark ー and small ッ are
    * handled by the scanner, not the table. */
  @inline private def toHiragana(c: Char): Char =
    if (c >= 'ァ' && c <= 'ヶ') (c - 0x60).toChar else c

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'

  /** Transliterate one string; see the object Scaladoc for the scheme.
    * A sokuon (small っ/ッ) geminates the next consonant; when nothing
    * consumes it — trailing っ, っ before a vowel-initial syllable, or っ
    * before unmapped text (Han/Latin) — it is emitted as "tsu" (the
    * standalone reading, matching unidecode's per-kana output) rather
    * than silently dropped. */
  def transliterate(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var geminate = false // a small っ/ッ doubles the next consonant
    @inline def flushSokuon(): Unit =
      if (geminate) { sb.append("tsu"); geminate = false }
    var i = 0
    while (i < s.length) {
      val raw = s.charAt(i)
      val c = toHiragana(raw)
      if (c == 'っ') { flushSokuon(); geminate = true; i += 1 }
      else if (raw == 'ー') {
        flushSokuon()
        // long-vowel mark: repeat the previous output vowel if any
        val n = sb.length()
        if (n > 0 && isVowel(sb.charAt(n - 1))) sb.append(sb.charAt(n - 1))
        i += 1
      } else {
        val base: String =
          kana.get(c).orElse(greek.get(raw)).orElse(cyrillic.get(raw))
            .getOrElse(null)
        if (base == null) { flushSokuon(); sb.append(raw); i += 1 }
        else {
          var syl = base
          // kana digraphs: look at the NEXT char (katakana-folded)
          if (i + 1 < s.length) {
            val nx = toHiragana(s.charAt(i + 1))
            if (kana.contains(c) && smallY.contains(nx) && syl.endsWith("i")) {
              val stem = syl.dropRight(1) // ki->k, shi->sh, chi->ch, ji->j
              val y = smallY(nx)
              // ONLY sh/ch/j swallow the y (sha/cha/ja); a bare "h"
              // stem (hi) keeps it: ひゃ -> hya, not "ha"
              syl =
                if (stem == "sh" || stem == "ch" || stem == "j")
                  stem + y.drop(1)
                else stem + y // kya, hya, nya, ...
              i += 1
            } else if (kana.contains(c) && syl.length > 1 &&
              smallVowel.contains(nx)) {
              syl = syl.dropRight(1) + kana(nx) // ヴォ -> vo, ファ -> fa
              i += 1
            }
          }
          if (geminate && syl.nonEmpty && !isVowel(syl.charAt(0))) {
            sb.append(syl.charAt(0)); geminate = false
          } else flushSokuon() // vowel-initial syllable can't geminate
          sb.append(syl)
          i += 1
        }
      }
    }
    flushSokuon() // trailing っ
    sb.toString
  }
}
