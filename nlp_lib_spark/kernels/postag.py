"""Frozen deterministic POS tagger.

Stands in for the reference's parse-tree POS re-assignment
(``relx/ppi/RunRelex.java:187-195`` / Stanford preterminals): a closed-class
lexicon plus suffix heuristics, context-free and deterministic so the oracle
and the distributed pipeline agree bit-for-bit. The rule layer only consumes
coarse distinctions (``IN|TO``, ``N*``, ``NN*``, ``V*``, ``JJ``, ``RB``),
so this tagger is deliberately small.
"""

from __future__ import annotations

PREPOSITIONS = {
    "of", "by", "to", "on", "for", "in", "through", "with", "between",
    "from", "like", "including", "into", "at", "over", "under", "via",
    "within", "during", "against", "without",
}
DETERMINERS = {"the", "a", "an", "this", "that", "these", "those", "its", "their"}
CONJUNCTIONS = {"and", "or", "but", "nor"}
MODALS = {"can", "could", "may", "might", "must", "shall", "should", "will", "would"}
PRONOUNS = {"it", "they", "we", "he", "she", "i", "you", "them", "him", "her", "us"}
BE_FORMS = {"is", "are", "was", "were", "be", "been", "being", "am"}
HAVE_FORMS = {"has", "have", "had"}
DO_FORMS = {"do", "does", "did"}
NEGATIONS = {"not", "n't", "never", "no"}
ADVERBS = {"however", "also", "very", "strongly", "weakly", "directly",
           "thus", "therefore", "moreover", "furthermore", "then", "here"}
ADJECTIVES = {"small", "big", "fast", "slow", "new", "unclear", "similar",
              "identical", "novel", "specific", "direct", "present", "previous"}

# Verb *stems* (see kernels.stem) recognised as verbal; domain/relation verbs
# are added per-deployment via ``extra_verb_stems``.
VERB_STEMS = {
    "suggest", "observ", "see", "remain", "show", "indicat", "report",
    "describ", "find", "found", "reveal", "demonstrat", "confirm", "occur",
    "requir", "caus", "lead", "result", "appear", "seem", "involv", "us",
}

from nlp_lib_spark.kernels.stem import stem


def pos_tag(tokens: list[str], extra_verb_stems: frozenset[str] | set[str] = frozenset()) -> list[str]:
    tags: list[str] = []
    for idx, tok in enumerate(tokens):
        low = tok.lower()
        if "PROTEIN" in tok:
            tags.append("NN")
        elif not tok[:1].isalnum():
            tags.append(tok)  # punctuation tags as itself (PTB style-ish)
        elif low == "to":
            tags.append("TO")
        elif low in PREPOSITIONS:
            tags.append("IN")
        elif low in DETERMINERS:
            tags.append("DT")
        elif low in CONJUNCTIONS:
            tags.append("CC")
        elif low in MODALS:
            tags.append("MD")
        elif low in PRONOUNS:
            tags.append("PRP")
        elif low in BE_FORMS or low in HAVE_FORMS or low in DO_FORMS:
            tags.append("VBZ" if low.endswith("s") else "VB")
        elif low in NEGATIONS or low in ADVERBS:
            tags.append("RB")
        elif low in ADJECTIVES:
            tags.append("JJ")
        elif low.isdigit():
            tags.append("CD")
        elif low.endswith(("tion", "sion", "ment", "ance", "ence", "ness",
                           "ship", "ity", "tions", "sions", "ments")):
            tags.append("NN" if not low.endswith("s") else "NNS")
        else:
            st = stem(low)
            if st in VERB_STEMS or st in extra_verb_stems:
                if low.endswith("ing"):
                    # gerund: verbal only in progressive position (after BE)
                    prior = [t.lower() for t in tokens[max(0, idx - 2):idx]]
                    if any(p in BE_FORMS for p in prior):
                        tags.append("VBG")
                    else:
                        tags.append("NN")
                elif low.endswith("ed"):
                    # passive participle if a BE form appears shortly before
                    prior = [t.lower() for t in tokens[max(0, idx - 3):idx]]
                    tags.append("VBN" if any(p in BE_FORMS for p in prior) else "VBD")
                elif low.endswith("s"):
                    tags.append("VBZ")
                else:
                    tags.append("VB")
            elif low.endswith("ly"):
                tags.append("RB")
            else:
                tags.append("NNS" if low.endswith("s") else "NN")
    return tags
