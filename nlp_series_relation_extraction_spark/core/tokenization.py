"""Deterministic tokenizer with reference-parity segmentation semantics.

The reference tokenizes in two steps (reference ``dataset/data_utils.py:67-112``
and ``utils/extract_chinese_and_punct.py``):

1. **char-class segmentation**: the text is split into *units* — every
   CJK-or-punctuation character is its own unit; maximal runs of digits and
   maximal runs of other characters ("letter runs") are kept as single units.
   A digit run is flushed when a letter arrives and vice versa.
2. **wordpiece per unit** with char-offset bookkeeping: each unit is
   tokenized; every produced token records the (start, end) char span of its
   *unit* in the original text (``tok_to_orig_start_index`` /
   ``tok_to_orig_end_index``). A unit equal to ``' '`` produces no token.

Step 2 in the reference calls a trained BERT wordpiece vocabulary, which is
not shippable here (and irrelevant to the relational semantics). Our
deterministic stand-in lowercases each unit and — like real wordpiece on
long English words / digit runs — splits any unit longer than
``MAX_WORDPIECE_CHARS`` into several sub-tokens, the continuation pieces
carrying the ``##`` prefix. ALL sub-tokens of a unit share the unit's char
span in ``tok_to_orig_*`` (reference ``data_utils.py:104-108``: every
``sub_token`` from ``tokenizer.tokenize(token)`` records the same
``len(text_tmp)-len(token) .. len(text_tmp)-1`` span), so the >1-token-per-
unit offset bookkeeping the reference was built around is actually
exercised. Single CJK chars stay single tokens (each is already its own
unit). Whitespace-only units produce no token. Both the Spark pipeline and
the plain-Python oracle share this tokenizer, so offset-map and span
semantics are exercised exactly as in the reference.

The BIO head uses the "fast tokenizer" shape instead (reference
``dataset/dataset_baseline.py:56-63``): per-token ``offset_mapping`` char
pairs with [CLS]/[SEP] sentinels at (0, 0).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# CJK + CJK-punctuation + ASCII-punctuation character class, mirroring the
# Unicode ranges the reference's ChineseAndPunctuationExtractor matches
# (reference utils/extract_chinese_and_punct.py:22-68).
_HAN_RANGES = [
    (0x2E80, 0x2E99),
    (0x2E9B, 0x2EF3),
    (0x2F00, 0x2FD5),
    (0x3005, 0x3005),
    (0x3007, 0x3007),
    (0x3021, 0x3029),
    (0x3038, 0x303A),
    (0x303B, 0x303B),
    (0x3400, 0x4DB5),
    (0x4E00, 0x9FC3),
    (0xF900, 0xFA2D),
    (0xFA30, 0xFA6A),
    (0xFA70, 0xFAD9),
    (0x20000, 0x2A6D6),
    (0x2F800, 0x2FA1D),
]
_CN_PUNCT_CODEPOINTS = [
    0x3002, 0xFF1F, 0xFF01, 0xFF0C, 0x3001, 0xFF1B, 0xFF1A, 0x300C, 0x300D,
    0x300E, 0x300F, 0x2018, 0x2019, 0x201C, 0x201D, 0xFF08, 0xFF09, 0x3014,
    0x3015, 0x3010, 0x3011, 0x2014, 0x2026, 0x2013, 0xFF0E, 0x300A, 0x300B,
    0x3008, 0x2460, 0x2461, 0x2462, 0x2463, 0x2464, 0x2465, 0x2466, 0x2467,
    0x2468, 0x2469, 0x3009, 0x2015, 0xFF0D, 0x0020, 0xFF5E,
]
_EN_PUNCT_RANGES = [(0x21, 0x2F), (0x3A, 0x40), (0x5B, 0x60), (0x7B, 0x7E)]


def _build_cjk_punct_re() -> re.Pattern:
    parts = []
    for lo, hi in _HAN_RANGES + _EN_PUNCT_RANGES:
        parts.append(f"{chr(lo)}-{chr(hi)}" if lo != hi else chr(lo))
    parts.extend(chr(c) for c in _CN_PUNCT_CODEPOINTS)
    return re.compile("[%s]" % "".join(parts), re.UNICODE)


CJK_PUNCT_RE = _build_cjk_punct_re()
_DIGIT_RE = re.compile(r"\d")


def is_cjk_or_punct(ch: str) -> bool:
    return CJK_PUNCT_RE.match(ch) is not None


def segment_units(text: str) -> list[str]:
    """Char-class segmentation into units (see module docstring, step 1)."""
    units: list[str] = []
    buff = ""
    flag_en = False
    flag_digit = False
    for ch in text:
        if CJK_PUNCT_RE.match(ch):
            if buff:
                units.append(buff)
                buff = ""
            units.append(ch)
            flag_en = False
            flag_digit = False
        elif _DIGIT_RE.match(ch):
            if buff and flag_en:
                units.append(buff)
                buff = ""
                flag_en = False
            flag_digit = True
            buff += ch
        else:
            if buff and flag_digit:
                units.append(buff)
                buff = ""
                flag_digit = False
            flag_en = True
            buff += ch
    if buff:
        units.append(buff)
    return units


# Chunk width of the wordpiece stand-in: units longer than this split into
# several sub-tokens (the multi-sub-token case of reference
# data_utils.py:98-112), continuation pieces prefixed '##' like BERT.
MAX_WORDPIECE_CHARS = 4

# Optional trained sub-word vocabulary (set of pieces, continuations
# '##'-prefixed). When set, tokenize_unit segments by greedy longest-match
# against it — the reference's real wordpiece semantics
# (data_utils.py:98-112 via tokenizer.tokenize) — instead of fixed-width
# chunking. Train one with functions/bpe.py (wordpiece_vocab) and activate
# via set_wordpiece_vocab / the use_wordpiece_vocab context manager; Spark
# UDFs re-activate it inside each worker process from their closure
# (operators/extract.py), so driver-side module state never needs to
# propagate implicitly.
_ACTIVE_WORDPIECE_VOCAB: "WordpieceVocab | None" = None


class WordpieceVocab:
    """A piece set plus its max-piece-length window bounds.

    Greedy longest-match is O(unit_len * max_piece_len) hash probes per
    unit and INDEPENDENT of vocabulary size — BERT's own
    WordpieceTokenizer bounds the candidate window the same way
    (max_input_chars_per_word + vocab dict). Without the window a 30k-
    entry vocab pays len(unit)^2 probes on long units for matches that
    cannot exist; with it, cost is fixed by the longest piece actually in
    the vocab (realistic vocabs: <= ~20 chars)."""

    __slots__ = ("pieces", "max_first", "max_cont")

    def __init__(self, pieces):
        self.pieces = frozenset(pieces)
        self.max_first = max(
            (len(p) for p in self.pieces if not p.startswith("##")), default=0
        )
        self.max_cont = max(
            (len(p) - 2 for p in self.pieces if p.startswith("##")), default=0
        )

    def __contains__(self, piece: str) -> bool:
        return piece in self.pieces

    def __len__(self) -> int:
        return len(self.pieces)

    def __iter__(self):
        return iter(self.pieces)


def set_wordpiece_vocab(pieces) -> None:
    """Activate (or with None, deactivate) a trained sub-word vocabulary
    for tokenize_unit in THIS process."""
    global _ACTIVE_WORDPIECE_VOCAB
    if pieces is None:
        _ACTIVE_WORDPIECE_VOCAB = None
    elif isinstance(pieces, WordpieceVocab):
        _ACTIVE_WORDPIECE_VOCAB = pieces
    else:
        _ACTIVE_WORDPIECE_VOCAB = WordpieceVocab(pieces)


def get_wordpiece_vocab() -> "WordpieceVocab | None":
    return _ACTIVE_WORDPIECE_VOCAB


class use_wordpiece_vocab:
    """Context manager scoping an active vocab (tests / driver-side use)."""

    def __init__(self, pieces):
        self.pieces = pieces

    def __enter__(self):
        self.prev = _ACTIVE_WORDPIECE_VOCAB
        set_wordpiece_vocab(self.pieces)
        return self

    def __exit__(self, *exc):
        set_wordpiece_vocab(self.prev)
        return False


def tokenize_unit(unit: str, vocab: frozenset[str] | None = None) -> list[str]:
    """Deterministic wordpiece (reference data_utils.py:104 calls
    ``tokenizer.tokenize(token)`` which may emit SEVERAL sub-tokens).

    * ``' '`` and other whitespace-only units produce no token;
    * with a trained vocabulary active (``vocab`` arg or
      set_wordpiece_vocab), units segment by GREEDY LONGEST-MATCH against
      it — continuation pieces looked up with the ``##`` prefix, exactly
      BERT's WordpieceTokenizer walk. Where no piece matches, one char is
      consumed as its own piece (char fallback) instead of BERT's whole-word
      [UNK]: span bookkeeping needs every unit to produce >= 1 token, and
      all sub-tokens of a unit share the unit's char span either way;
    * without a vocabulary: units of <= MAX_WORDPIECE_CHARS chars produce
      one lowercased token (every CJK char is its own unit, so CJK stays
      one token per char); longer units (English words, digit runs) split
      into fixed-width chunks, continuation chunks carrying the ``##``
      prefix.

    Both modes are deterministic and context-free per unit, so an entity
    string always tokenizes to the same sub-token sequence as its in-text
    occurrence — the property the span-matching heads rely on.
    """
    if unit == " ":
        return []
    # Whitespace-only units vanish, like BERT's cleaner ('\xa0' is isspace).
    if unit.isspace():
        return []
    low = unit.lower()
    if vocab is None:
        vocab = _ACTIVE_WORDPIECE_VOCAB
    if vocab is not None:
        if not isinstance(vocab, WordpieceVocab):
            vocab = WordpieceVocab(vocab)  # ad-hoc sets in tests/callers
        pieces: list[str] = []
        start = 0
        while start < len(low):
            # window capped at the longest piece that exists in the vocab
            # (first-piece vs ##-continuation tracked separately): probes
            # per position are bounded by the vocab's own piece lengths,
            # never by unit length — BERT's candidate-length cap.
            width = vocab.max_first if start == 0 else vocab.max_cont
            end = min(len(low), start + width)
            cur = None
            while end > start:
                sub = low[start:end]
                cand = ("##" + sub) if start else sub
                if cand in vocab:
                    cur = cand
                    break
                end -= 1
            if cur is None:  # char fallback (see docstring)
                cur = ("##" + low[start]) if start else low[start]
                end = start + 1
            pieces.append(cur)
            start = end
        return pieces
    if len(low) <= MAX_WORDPIECE_CHARS:
        return [low]
    pieces = [low[:MAX_WORDPIECE_CHARS]]
    for i in range(MAX_WORDPIECE_CHARS, len(low), MAX_WORDPIECE_CHARS):
        pieces.append("##" + low[i : i + MAX_WORDPIECE_CHARS])
    return pieces


@dataclass
class Tokenized:
    """Tokens plus both offset representations used by the four heads."""

    tokens: list[str]  # without [CLS]/[SEP]
    tok_to_orig_start: list[int]  # char start of each token's unit
    tok_to_orig_end: list[int]  # inclusive char end of each token's unit


def tokenize_with_orig_index(text: str) -> Tokenized:
    """Tokenize and build tok->orig char maps (reference data_utils.py:98-112).

    Each token maps to the full char span of the unit that produced it:
    start = len(consumed_text) - len(unit), end = len(consumed_text) - 1.
    """
    units = segment_units(text)
    starts: list[int] = []
    ends: list[int] = []
    tokens: list[str] = []
    consumed = 0
    for unit in units:
        sub_tokens = tokenize_unit(unit)
        consumed += len(unit)
        for sub in sub_tokens:
            starts.append(consumed - len(unit))
            ends.append(consumed - 1)
            tokens.append(sub)
    return Tokenized(tokens=tokens, tok_to_orig_start=starts, tok_to_orig_end=ends)


def tokenize_for_bio(text: str) -> tuple[list[str], list[tuple[int, int]]]:
    """Fast-tokenizer shape for the BIO head: tokens framed by [CLS]/[SEP]
    with per-token (start, end_exclusive) char offset_mapping; sentinels map
    to (0, 0) (reference dataset/dataset_baseline.py:56-63).
    """
    t = tokenize_with_orig_index(text)
    tokens = ["[CLS]"] + t.tokens + ["[SEP]"]
    offsets = (
        [(0, 0)]
        + [(s, e + 1) for s, e in zip(t.tok_to_orig_start, t.tok_to_orig_end)]
        + [(0, 0)]
    )
    return tokens, offsets


def tokenize_framed(text: str) -> tuple[list[str], list[int], list[int]]:
    """[CLS]-framed token list + orig-index maps, the mpn/mhs head shape
    (reference dataset/dataset_mpn.py:38-41)."""
    t = tokenize_with_orig_index(text)
    return (
        ["[CLS]"] + t.tokens + ["[SEP]"],
        t.tok_to_orig_start,
        t.tok_to_orig_end,
    )


def truncate_framed(tokens: list[str], max_len: int) -> list[str]:
    """Bound a [CLS]-framed token list at ``max_len`` keeping the [SEP]
    frame — the shape of reference ``tokenizer.encode(...,
    max_length=max_len, truncation=True)`` (dataset_mpn.py:160-163)."""
    if len(tokens) <= max_len:
        return tokens
    return tokens[: max_len - 1] + ["[SEP]"]


def normalize_text(text: str) -> str:
    """Pre-tokenization normalization: drop ``®`` and ``◆`` (reference
    dataset/dataset_mpn.py:36-37). Applied JVM-side with regexp_replace in
    the Spark plan; this helper keeps the oracle identical."""
    return text.replace("®", "").replace("◆", "")
