#!/usr/bin/env python3
"""CPython golden generator for the subword-accurate decode gate
(q_decode_subword / DecodeSpec).

Transcribes the reference decode loop semantics (src/prod.py:52-117:
skip word_id None; read the tag only at each word's FIRST subtoken;
extend an open entity to the end of the CURRENT word via the forward
cursor scan; adjacent same-tag spans merge; trailing entity flushed)
and replays realistic HF-style word_ids/offset sequences: multi-subtoken
words (3+ pieces), [CLS]/[SEP]/pad None-runs mid-sequence, adjacent
same-tag distinct words, tag changes mid-word-sequence, and a trailing
open entity ending in a split word.

Prints, per fixture: the Scala arrays for SparkEntry's q_decode_subword
query and the expected (doc, tag, entity, start, end) VALUES rows.
Run: python3 tools/gen_subword_goldens.py
"""


def decode(text, word_ids, offsets, tags):
    """prod.py:52-117 with predictions already mapped to tag strings."""
    entities = []
    current = None
    prev_word = None
    for idx, w in enumerate(word_ids):
        if w is None:
            continue
        if w != prev_word:
            tag = tags[idx]
            tok_start, tok_end = offsets[idx]
            if tag != "O":
                if current and tag == current["tag"]:
                    pass
                else:
                    if current:
                        entities.append((current["tag"],
                                         text[current["start"]:current["end"]],
                                         current["start"], current["end"]))
                    current = {"tag": tag, "start": tok_start, "end": tok_end}
            else:
                if current:
                    entities.append((current["tag"],
                                     text[current["start"]:current["end"]],
                                     current["start"], current["end"]))
                    current = None
            if current:
                cursor = idx
                while cursor + 1 < len(word_ids) and word_ids[cursor + 1] == w:
                    cursor += 1
                current["end"] = offsets[cursor][1]
        prev_word = w
    if current:
        entities.append((current["tag"], text[current["start"]:current["end"]],
                         current["start"], current["end"]))
    return entities


def tokenize(text, word_pieces, word_tags, specials_at=()):
    """Build HF-style arrays. word_pieces: list of (word_start, [piece
    lengths]) per whitespace word in order; word_tags: the tag of each
    word's FIRST subtoken (later subtokens get a decoy tag to prove they
    are never read). specials_at: indices in the SUBTOKEN stream where a
    None-word special token is inserted."""
    word_ids, offsets, tags = [], [], []
    widx = 0
    for (start, pieces), tag in zip(word_pieces, word_tags):
        pos = start
        for k, ln in enumerate(pieces):
            word_ids.append(widx)
            offsets.append((pos, pos + ln))
            # decoy tag on non-first subtokens: must be ignored
            tags.append(tag if k == 0 else "DECOY")
            pos += ln
        widx += 1
    for i in sorted(specials_at):
        word_ids.insert(i, None)
        offsets.insert(i, (0, 0))
        tags.insert(i, "O")
    return word_ids, offsets, tags


FIXTURES = []

# d2: 3+ subtokens per word, multi-word entity, None-runs mid-sequence.
#      text:  "Hoshimachi Suisei sings Stellar Stellar tonight"
#              0          11     18    24      32      40
text = "Hoshimachi Suisei sings Stellar Stellar tonight"
wp = [(0, [4, 3, 3]),      # Hoshi|mach|i  (3 pieces)
      (11, [3, 3]),        # Sui|sei
      (18, [5]),           # sings
      (24, [4, 3]),        # Stel|lar
      (32, [4, 3]),        # Stel|lar (second word, same tag -> merge)
      (40, [7])]           # tonight
wt = ["VOCALIST", "VOCALIST", "O", "TITLE", "TITLE", "O"]
ids, offs, tags = tokenize(text, wp, wt, specials_at=(0, 6, 14))
FIXTURES.append(("d2", text, ids, offs, tags))

# d3: tag change mid-sequence closes and reopens; trailing open entity
#     in a 3-piece word (word-end extension must reach the last piece).
text = "Senbonzakura Gurenge by Yorushika"
wp = [(0, [3, 4, 5]),      # Sen|bonz|akura
      (13, [7]),           # Gurenge (adjacent DIFFERENT title -> new span)
      (21, [2]),           # by
      (24, [4, 2, 3])]     # Yoru|sh|ika (trailing, split)
wt = ["TITLE", "ALBUM", "O", "VOCALIST"]
ids, offs, tags = tokenize(text, wp, wt, specials_at=(0,))
FIXTURES.append(("d3", text, ids, offs, tags))

# d4: adjacent same-tag DISTINCT words merge into one span (the
#     reference quirk), with a None-run separating two entity groups.
text = "Melt Lemon covered by Ado"
wp = [(0, [4]),            # Melt   TITLE
      (5, [5]),            # Lemon  TITLE (distinct word, same tag -> merge)
      (11, [7]),           # covered
      (19, [2]),           # by
      (22, [3])]           # Ado
wt = ["TITLE", "TITLE", "MODIFIER", "O", "VOCALIST"]
ids, offs, tags = tokenize(text, wp, wt, specials_at=(0, 3, 8))
FIXTURES.append(("d4", text, ids, offs, tags))


def scala_arr(xs, f=str):
    return "Array(" + ", ".join(f(x) for x in xs) + ")"


for doc, text, ids, offs, tags in FIXTURES:
    ents = decode(text, ids, offs, tags)
    print(f"// ---- {doc}: {text!r}")
    print(f'val text_{doc} = "{text}"')
    print("val wordIds_" + doc + " = " +
          scala_arr([(-1 if w is None else w) for w in ids]))
    print("val starts_" + doc + " = " + scala_arr([o[0] for o in offs]))
    print("val ends_" + doc + " = " + scala_arr([o[1] for o in offs]))
    print("val tags_" + doc + " = " +
          scala_arr(tags, lambda t: f'"{t}"'))
    print("// expected entities:")
    for tag, etext, s, e in ents:
        print(f"//   ('{doc}', '{tag}', '{etext}', {s}, {e})")
    print("VALUES rows:")
    for tag, etext, s, e in ents:
        print(f"  ('{doc}', '{tag}', '{etext}', {s}, {e}),")
    print()
