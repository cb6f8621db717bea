"""Golden vectors for the Snowball English (Porter2) stemmer.

Vectors hand-derived from the published algorithm description
(snowballstem.org) and cross-checked where they overlap with the widely
published Porter2 sample vocabulary.
"""

from markdown_query_ray.functions.snowball import stem, CachingStemmer

VECTORS = {
    # step 0 / plurals
    "caresses": "caress",
    "ponies": "poni",
    "ties": "tie",
    "cries": "cri",
    "caress": "caress",
    "cats": "cat",
    "gas": "gas",
    "this": "this",
    "gaps": "gap",
    "dogs'": "dog",
    "dog's": "dog",
    # step 1b
    "feed": "feed",
    "agreed": "agre",
    "plastered": "plaster",
    "bled": "bled",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "troubled": "troubl",
    "sized": "size",
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "fizzed": "fizz",
    "failing": "fail",
    "filing": "file",
    "hoping": "hope",
    # step 1c
    "happy": "happi",
    "cry": "cri",
    "by": "by",
    "say": "say",
    "enjoy": "enjoy",
    # steps 2-4
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "hesitanci": "hesit",
    "digitizer": "digit",
    "conformabli": "conform",
    "radicalli": "radic",
    "differentli": "differ",
    "vileli": "vile",
    "analogousli": "analog",
    "vietnamization": "vietnam",
    "predication": "predic",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic",
    "formative": "formal" if False else "format",
    "formalize": "formal",
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "communism": "communism",
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat",
    "rate": "rate",
    "controll": "control",
    "roll": "roll",
    # exceptions
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "news": "news",
    "sky": "sky",
    "inning": "inning",
    "proceed": "proceed",
    "exceed": "exceed",
    # short words
    "a": "a",
    "be": "be",
    "ran": "ran",
    # y-prelude
    "youth": "youth",
    "yes": "yes",
    # general corpus words used by the synthetic fixtures
    "batches": "batch",
    "merging": "merg",
    "sorted": "sort",
    "windows": "window",
    "queries": "queri",
    "customers": "custom",
    "generate": "generat",
    "generalization": "general",
}


def test_vectors():
    bad = {w: (stem(w), want) for w, want in VECTORS.items() if stem(w) != want}
    assert not bad, f"stemmer mismatches: {bad}"


def test_caching_stemmer_consistent():
    cs = CachingStemmer()
    for w in VECTORS:
        assert cs(w) == stem(w)
        assert cs(w) == stem(w)  # cached path


def test_idempotent_on_stems():
    # Stems of our fixture vocabulary should be stable under re-stemming for
    # the common cases (not a general Porter2 property, but holds for these).
    for w in ["batch", "sort", "window", "merg", "custom"]:
        assert stem(stem(w)) == stem(w)
