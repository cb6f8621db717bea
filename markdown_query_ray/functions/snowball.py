"""Snowball English ("Porter2") stemmer, pure Python.

The reference stems with ``Stem::new("en")`` (src/main.rs:81), i.e. the
Snowball English stemmer bundled in xapian-core
(xapian-core-1.4.17/languages/english.sbl). No stemmer package ships in this
environment, so this is a from-scratch implementation of the publicly
documented algorithm (snowballstem.org, "The English (Porter2) stemming
algorithm"). Terms reach this already lowercased by the tokenizer, matching
STEM_SOME semantics.
"""

from __future__ import annotations

# After the prelude, consonant-y is rewritten to 'Y'; any remaining lowercase
# 'y' is a true vowel, so 'y' belongs in the vowel set and 'Y' does not.
_VOWELS = "aeiouy"
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDINGS = frozenset("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTIONS2 = frozenset([
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
])

_SPECIAL_R1_PREFIXES = ("gener", "commun", "arsen")

# Step 2/3/4 suffix tables, sorted longest-first so a simple first-match scan
# implements Snowball's longest-suffix rule. Special-conditioned suffixes use
# a marker string as replacement.
_STEP2 = sorted([
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "@ogi"), ("li", "@li"),
], key=lambda p: -len(p[0]))

_STEP3 = sorted([
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ful", ""), ("ness", ""), ("ative", "@ative"),
], key=lambda p: -len(p[0]))

_STEP4 = sorted([
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic", "ion",
], key=len, reverse=True)


def _regions(word: str) -> tuple[int, int]:
    """(r1, r2) start offsets; positions >= len(word) mean the region is null."""
    n = len(word)
    r1 = n
    for pfx in _SPECIAL_R1_PREFIXES:
        if word.startswith(pfx):
            r1 = len(pfx)
            break
    else:
        for i in range(1, n):
            if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """Short syllable: non-vowel + vowel + non-vowel(not w/x/Y), or the whole
    word is vowel + non-vowel."""
    n = len(word)
    if n == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if n >= 3:
        c1, v, c2 = word[-3], word[-2], word[-1]
        return (c1 not in _VOWELS and v in _VOWELS
                and c2 not in _VOWELS and c2 not in "wxY")
    return False


def _contains_vowel(s: str) -> bool:
    return any(ch in _VOWELS for ch in s)


def stem(word: str) -> str:
    """Stem one lowercase word."""
    if len(word) <= 2:
        return word

    if word.startswith("'"):
        word = word[1:]
        if len(word) <= 2:
            return word

    exc = _EXCEPTIONS1.get(word)
    if exc is not None:
        return exc

    # Prelude: mark y at start or after a vowel as consonant 'Y'.
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _regions(word)

    # Step 0: longest of  '  's  's'
    for sfx in ("'s'", "'s", "'"):
        if word.endswith(sfx):
            word = word[: -len(sfx)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith("ss") or word.endswith("us"):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # Step 1b
    for sfx in ("eedly", "eed"):
        if word.endswith(sfx):
            if len(word) - len(sfx) >= r1:
                word = word[: -len(sfx)] + "ee"
            break
    else:
        for sfx in ("ingly", "edly", "ing", "ed"):
            if word.endswith(sfx):
                rest = word[: -len(sfx)]
                if _contains_vowel(rest):
                    word = rest
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_short_syllable(word):
                        word += "e"  # "word is short": ends short syll, R1 null
                break

    # Step 1c: y/Y -> i when preceded by a non-vowel which is not the first
    # letter of the word.
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        word = word[:-1] + "i"

    # Step 2 (longest matching suffix; action applies only if suffix in R1)
    for sfx, repl in _STEP2:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= r1:
                if repl == "@ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif repl == "@li":
                    if len(word) > 2 and word[-3] in _LI_ENDINGS:
                        word = word[:-2]
                else:
                    word = word[: -len(sfx)] + repl
            break

    # Step 3 (in R1; "ative" additionally requires R2)
    for sfx, repl in _STEP3:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= r1:
                if repl == "@ative":
                    if len(word) - len(sfx) >= r2:
                        word = word[: -len(sfx)]
                else:
                    word = word[: -len(sfx)] + repl
            break

    # Step 4 (in R2; "ion" only when preceded by s or t)
    for sfx in _STEP4:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= r2:
                if sfx == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(sfx)]
            break

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1]):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) > 1 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")


class CachingStemmer:
    """Stemmer with a term->stem cache. With a Zipfian vocabulary the hit rate
    approaches 100% after warmup, so per-actor caching (held in the tokenizer
    actor's __init__ state) makes stemming nearly free per batch."""

    __slots__ = ("_cache",)

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}

    def __call__(self, word: str) -> str:
        s = self._cache.get(word)
        if s is None:
            s = stem(word)
            self._cache[word] = s
        return s
