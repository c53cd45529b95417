"""Porter2 (Snowball English) stemmer unit vectors.

Expected outputs follow the published algorithm (snowballstem.org English
stemmer) — the dictionary PostgreSQL's ``english`` FTS config stems with.
The pg-docs rows mirror the §12 tsvector examples ('a fat cat sat on a
mat - it ate a fat rats' → rat; 'jumped over the lazy dog' → jump, lazi).
"""

import pytest

from framequery_spark.functions.snowball import stem, stem_words

VECTORS = [
    # pg docs examples
    ("rats", "rat"), ("ate", "ate"), ("cat", "cat"), ("mat", "mat"),
    ("jumped", "jump"), ("lazy", "lazi"), ("quick", "quick"),
    # plurals / ies / ied
    ("ponies", "poni"), ("ties", "tie"), ("dies", "die"),
    ("cries", "cri"), ("cried", "cri"), ("caresses", "caress"),
    ("gas", "gas"), ("gaps", "gap"), ("this", "this"),
    # 1b: ed/ing with at/bl/iz, doubles, short words
    ("running", "run"), ("hopping", "hop"), ("hoping", "hope"),
    ("hoped", "hope"), ("sized", "size"), ("conflated", "conflat"),
    ("troubled", "troubl"), ("filing", "file"), ("falling", "fall"),
    ("meeting", "meet"), ("agreed", "agre"), ("arguing", "argu"),
    # 1c
    ("happy", "happi"), ("cry", "cri"), ("by", "by"), ("say", "say"),
    # step 2
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valency", "valenc"),
    ("hesitancy", "hesit"), ("digitizer", "digit"),
    ("conformably", "conform"), ("radically", "radic"),
    ("differently", "differ"), ("vilely", "vile"),
    ("analogously", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formality", "formal"), ("sensitivity", "sensit"),
    ("sensibility", "sensibl"), ("quickly", "quick"),
    # step 3
    ("triplicate", "triplic"), ("formalize", "formal"),
    ("electricity", "electr"), ("electrical", "electr"),
    ("hopeful", "hope"), ("goodness", "good"),
    # formative keeps 'format': 'ative' lies outside R2 here (region
    # rule, unlike Porter1 which maps it to 'form')
    ("formative", "format"),
    # step 4
    ("revival", "reviv"), ("allowance", "allow"),
    ("inference", "infer"), ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"), ("adjustable", "adjust"),
    ("defensible", "defens"), ("irritant", "irrit"),
    ("replacement", "replac"), ("adjustment", "adjust"),
    ("dependent", "depend"), ("adoption", "adopt"),
    ("homologous", "homolog"), ("effective", "effect"),
    ("bowdlerize", "bowdler"), ("activate", "activ"),
    ("angularity", "angular"), ("argument", "argument"),
    # step 5
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
    # gener/commun/arsen R1 prefixes
    ("generate", "generat"), ("generally", "general"),
    ("generic", "generic"), ("generous", "generous"),
    ("communities", "communiti"), ("community", "communiti"),
    ("communism", "communism"),
    # exceptional forms
    ("skis", "ski"), ("skies", "sky"), ("dying", "die"),
    ("lying", "lie"), ("tying", "tie"), ("idly", "idl"),
    ("gently", "gentl"), ("ugly", "ugli"), ("early", "earli"),
    ("only", "onli"), ("singly", "singl"),
    ("sky", "sky"), ("news", "news"), ("bias", "bias"),
    # invariant after 1a
    ("inning", "inning"), ("outing", "outing"), ("canning", "canning"),
    ("herring", "herring"), ("earring", "earring"),
    ("proceed", "proceed"), ("exceed", "exceed"), ("succeed", "succeed"),
    # consonant-y marking
    ("toy", "toy"), ("toys", "toy"), ("youth", "youth"),
    # consign family (snowball sample vocabulary)
    ("consign", "consign"), ("consigned", "consign"),
    ("consigning", "consign"), ("consignment", "consign"),
    ("consist", "consist"), ("consisted", "consist"),
    ("consistency", "consist"), ("consistent", "consist"),
    ("consistently", "consist"), ("consisting", "consist"),
    ("consists", "consist"),
    ("knack", "knack"), ("knackeries", "knackeri"), ("knacks", "knack"),
]


@pytest.mark.parametrize("word,expected", VECTORS)
def test_porter2_vector(word, expected):
    assert stem(word) == expected


def test_short_words_unchanged():
    for w in ("a", "i", "is", "be", "by", "ox"):
        assert stem(w) == w


def test_stem_words_batch_matches_scalar():
    words = [w for w, _ in VECTORS]
    assert stem_words(words) == [stem(w) for w in words]
