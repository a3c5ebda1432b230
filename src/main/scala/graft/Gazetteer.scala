package graft

/**
 * The deterministic knowledge source that replaces the reference's learned
 * model (north rule: broadcast gazetteer + Aho-Corasick instead of ONNX —
 * reference model path: src/model/ModelWrapper.py:128-139).
 *
 * Tag vocabulary = the reference's label table (src/config/config.py:1-12).
 * Modifier lemmas = src/config/config.py:23-28. Me-stop-words =
 * src/prod.py:119.
 *
 * Surfaces deliberately cover the tokenizer's interesting ranges
 * (TokenizerCustom.py:9): CJK, hiragana/katakana, fullwidth latin,
 * Hungarian accented vowels — so detector fixtures pin regex parity.
 */
object Gazetteer {

  val Tags: Seq[String] = Seq("O", "ORIGINAL_AUTHOR", "TITLE", "MODIFIER",
    "VOCALOID", "ALBUM", "MISC_PERSON", "VOCALIST", "ALT_TITLE", "FEATURING")

  val TagToId: Map[String, Int] = Tags.zipWithIndex.toMap
  val IdToTag: Map[Int, String] = TagToId.map(_.swap)

  /** src/config/config.py:23-28 */
  val ModifierLemmas: Map[String, String] = Map(
    "covered" -> "cover", "remixed" -> "remix",
    "arranged" -> "arrange", "rearranged" -> "rearrange")

  /** src/prod.py:119 */
  val MeStopWords: Set[String] = Set("me", "myself", "i")

  final case class Entry(surface: String, tag: String, entityId: String,
      lang: String, priority: Int)

  private def mk(tag: String, prefix: String, surfaces: Seq[String],
      lang: String = "en"): Seq[Entry] =
    surfaces.zipWithIndex.map { case (s, i) =>
      Entry(s, tag, s"$prefix${i + 1}", lang, 0)
    }

  val titles: Seq[String] = Seq(
    "Senbonzakura", "Melt", "World is Mine", "Rolling Girl", "Ghost Rule",
    "Unravel", "Lemon", "Pretender", "Gurenge", "Ashes of the Dawn",
    "Crystal Teardrop", "Night Parade", "Paper Moon Waltz", "Silent Vermilion",
    "Clockwork Lullaby", "Neon Genesis Lament", "Sakura Fubuki",
    "Tavaszi Szél", "Kék Duna Keringő", "夜に駆ける", "群青", "うっせぇわ",
    "Hollow Cathedral", "Glass Aquarium", "Winter Meteor", "Zero Gravity Heart",
    "Marble Soda Sky", "Electric Hanami", "Last Train Home", "Iron Butterfly Waltz")

  val authors: Seq[String] = Seq(
    "Hachi", "DECO*27", "wowaka", "Kenshi Yonezu", "Ayase", "syudou",
    "Mitchie M", "PinocchioP", "Neru", "Kikuo", "Bartók Béla",
    "Liszt Ferenc", "Erkel Ferenc", "米津玄師", "中田ヤスタカ",
    "Aurora Vex", "Crimson Tide Orchestra", "Midnight Prism", "Velvet Cogs",
    "Stellar Dustworks")

  val vocaloids: Seq[String] = Seq(
    "Hatsune Miku", "Kagamine Rin", "Kagamine Len", "Megurine Luka",
    "GUMI", "KAITO", "MEIKO", "IA", "flower", "Kasane Teto")

  val albums: Seq[String] = Seq(
    "Re:Dial", "Mikunopolis", "Unhappy Refrain", "Bootleg", "Stray Sheep",
    "Ceremony", "Fragments of Polaris", "Chrome Gardens", "Analog Heartbeats",
    "The Glasshouse Sessions", "Hungarian Dances Vol 3", "深海シティ")

  val vocalists: Seq[String] = Seq(
    "Mafumafu", "Soraru", "Eve", "Ado", "LiSA", "Kenshi Hollow",
    "Reol", "Majiko", "Sekai no Owari", "Yorushika", "Palotás Anna",
    "Szabó Márton")

  val miscPersons: Seq[String] = Seq(
    "Ryo Watanabe", "Anna Kovács", "Peter Molnar", "Yuki Tanaka",
    "the mixing engineer Sato", "illustrator Nezuki", "MV director Oka",
    "producer Halvorsen")

  val featuring: Seq[String] = Seq(
    "Charlie Nox", "Rin Orbit", "Luka Nightfall", "Aria Lune",
    "Kaito Shion", "MC Paprika", "DJ Szilva", "Neon Fox")

  val altTitles: Seq[String] = Seq(
    "Thousand Cherry Blossoms", "Yoru ni Kakeru", "Racing into the Night",
    "Gunjou", "Usseewa", "The Hollow Cathedral Suite", "Spring Wind",
    "Blue Danube Waltz")

  val modifiers: Seq[String] = Seq(
    "covered", "remixed", "arranged", "rearranged", "cover", "remix",
    "acoustic", "instrumental", "acapella", "orchestral")

  /** Pronoun self-references detected as ORIGINAL_AUTHOR; the me-sub step
    * (src/prod.py:119-125) then rewrites them to the speaker. */
  val pronouns: Seq[String] = Seq("me", "myself", "I")

  val entries: Seq[Entry] =
    mk("TITLE", "t", titles) ++
      mk("ORIGINAL_AUTHOR", "a", authors) ++
      mk("VOCALOID", "v", vocaloids) ++
      mk("ALBUM", "al", albums) ++
      mk("VOCALIST", "vo", vocalists) ++
      mk("MISC_PERSON", "p", miscPersons) ++
      mk("FEATURING", "f", featuring) ++
      mk("ALT_TITLE", "at", altTitles) ++
      mk("MODIFIER", "m", modifiers) ++
      mk("ORIGINAL_AUTHOR", "self", pronouns)

  /** surface(lowercased) -> entity_id, for the linking stage; on ambiguity
    * the lowest-priority (then first-listed) entry wins — deterministic. */
  val linkIndex: Map[String, String] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    entries.sortBy(_.priority).foreach { e =>
      val k = e.surface.toLowerCase(java.util.Locale.ROOT)
      if (!m.contains(k)) m(k) = e.entityId
    }
    m.toMap
  }
}
