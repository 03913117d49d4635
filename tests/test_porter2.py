"""Golden tests for the Porter2 stemmer against NLTK's independent
implementation of the same Snowball English algorithm."""

import pytest

from spaghettisearch_tpu.text.porter2 import stem

CASES = {
    # exceptional forms
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
    # post-1a invariants
    "inning": "inning", "outing": "outing", "canning": "canning",
    "herring": "herring", "earring": "earring", "proceed": "proceed",
    "exceed": "exceed", "succeed": "succeed",
    # step 1a
    "caresses": "caress", "ties": "tie", "cries": "cri",
    "gaps": "gap", "gas": "gas", "kiwis": "kiwi", "this": "this",
    # step 1b
    "agreed": "agre", "feed": "feed", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail", "filing": "file",
    # step 1c
    "happy": "happi", "cry": "cri", "by": "by", "say": "say",
    # steps 2-4
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "format", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "communism",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # y-handling
    "youth": "youth", "boy": "boy", "boyishness": "boyish",
    "yearly": "year", "syzygy": "syzygi",
    # generic
    "generate": "generat", "generically": "generic", "generous": "generous",
    "communication": "communic", "arsenic": "arsenic", "arsenal": "arsenal",
}


@pytest.mark.parametrize("word,expected", sorted(CASES.items()))
def test_known_cases(word, expected):
    assert stem(word) == expected


def test_short_words_pass_through():
    for w in ("a", "is", "be", "i", "x", ""):
        assert stem(w) == w


def test_against_nltk_wordlists():
    """Golden parity with NLTK Snowball English on a large vocabulary."""
    nltk = pytest.importorskip("nltk.stem.snowball")
    oracle = nltk.SnowballStemmer("english")

    words = set(CASES)
    # the stopword list + a spread of morphology-heavy words
    from spaghettisearch_tpu.text.stopwords import STOPWORDS

    words |= {w for w in STOPWORDS if w}
    words |= {
        "abatements", "abilities", "absorbency", "accompaniment", "accusations",
        "achievements", "acknowledgements", "administrations", "advertisements",
        "agglomeration", "aggressiveness", "alphabetically", "amelioration",
        "anticipations", "apologetically", "appreciatively", "argumentative",
        "assassinations", "authoritatively", "beautifications", "bewilderment",
        "capitalizations", "categorically", "characterizations", "civilizations",
        "classifications", "commercialization", "computerization",
        "concatenation", "confidentiality", "congratulations", "connectivity",
        "conscientiously", "considerations", "containerization", "continuously",
        "counterproductive", "crystallization", "decentralization",
        "demonstrations", "denominational", "destabilization", "dimensionality",
        "disconnections", "discriminatory", "disillusionment", "dramatically",
        "editorializing", "electrification", "embarrassingly", "encouragement",
        "enthusiastically", "environmentalists", "exaggerations",
        "experimentation", "extraordinarily", "familiarization", "fictionalized",
        "generalizations", "geographically", "grandiloquently", "hospitalization",
        "hypothesizing", "identifications", "implementations", "impressionable",
        "inconsequential", "individualistic", "industrialization",
        "institutionalized", "intellectualism", "interchangeable",
        "internationalization", "interpretations", "investigations",
        "journalistically", "justifications", "legalizations", "luminosity",
        "manufacturers", "materialization", "mathematically", "memorization",
        "methodologies", "misrepresentation", "modernization", "nationalization",
        "naturalization", "negotiations", "normalization", "objectively",
        "organizational", "parameterization", "personalization", "popularization",
        "predictability", "privatization", "probabilistically", "qualifications",
        "rationalization", "recommendations", "reconciliations", "regularization",
        "representations", "responsibilities", "revolutionaries", "secularization",
        "sensationalism", "simplifications", "specializations", "standardization",
        "systematically", "technologically", "transformations", "understandably",
        "vaporization", "visualizations", "vulnerabilities", "crawling",
        "crawled", "crawler", "indexing", "indexed", "searching", "searched",
        "queries", "querying", "ranking", "ranked", "pages", "engines",
        "retrieval", "weighted", "weights", "positions", "positional",
        "universities", "university", "sciences", "engineering", "departments",
        "knitting", "knotted", "exponentially", "flying", "dies", "ties",
        "agreement", "disagreement", "happily", "luckily", "possibly",
        "abruptly", "aptly", "doubly", "feebly", "nimbly", "subtly",
        "outcry", "destroy", "enjoy", "obey", "money", "monkey", "donkeys",
        "analyses", "axes", "matrices", "vertices", "indices", "appendices",
        "does", "goes", "shoes", "echoes", "potatoes", "tomatoes",
    }
    # Known NLTK divergence from official Snowball: NLTK tracks R1/R2 as
    # strings which drift when a step-2/3 replacement shrinks the word past
    # the region boundary; official Snowball (and surgebase/porter2, the
    # reference's stemmer) keeps fixed character positions. We follow the
    # official position semantics, so words in this class legitimately differ.
    nltk_region_divergences = {
        "realization", "realizer", "sensationalism",
    }
    words -= nltk_region_divergences
    mismatches = {
        w: (stem(w), oracle.stem(w)) for w in sorted(words) if stem(w) != oracle.stem(w)
    }
    assert not mismatches, f"{len(mismatches)} mismatches: {mismatches}"
