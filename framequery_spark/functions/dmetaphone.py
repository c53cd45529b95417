"""Double Metaphone (Lawrence Philips, 2000) — the primary/alternate
phonetic encoder behind pg fuzzystrmatch's dmetaphone()/dmetaphone_alt()
(pg's dmetaphone.c adapts the same published algorithm).

Independent implementation of the published rule set: the silent-start
table (GN/KN/PN/WR/PS), initial-X-as-S, the Slavo-Germanic gate
(W/K/CZ/WITZ), and the per-letter condition groups (Germanic CH,
Italian CCIA/CCI, Spanish LL, Greek-root CH, Van/Von/SCH- prefixes,
French final -IER/-IES, Pinyin ZH, ...). Outputs truncate to 4 chars
like pg. Verified against the pg-docs §F.15 example
(dmetaphone('gumbo') = dmetaphone_alt('gumbo') = 'KMP') and the
widely-published canonical vectors pinned in tests/test_pg_conformance
(Smith SM0/XMT, michael MKL/MXL, school SKL, ...). Like metaphone(),
this is iterative per-string work with deep lookahead — an Arrow
pandas_udf (the documented exception tier), not a JVM expression.
"""
from __future__ import annotations

VOWELS = frozenset("AEIOUY")


def _double_metaphone(word: str, maxlen: int = 4):
    st = "".join(ch for ch in word.upper()
                 if "A" <= ch <= "Z" or ch == " ")
    n = len(st)
    last = n - 1
    # the published reference implementation pads the working string with
    # five trailing spaces, so end-of-word lookaheads compare equal to the
    # ' ' entries in its condition lists (JOSE+' ', CH before ' ', ...)
    padded = st + "     "
    pri: list = []
    sec: list = []

    def at(i: int) -> str:
        return padded[i] if 0 <= i < len(padded) else ""

    def sat(start: int, ln: int, options) -> bool:
        if start < 0:
            return False
        return padded[start:start + ln] in options

    def vow(i: int) -> bool:
        return at(i) in VOWELS

    def add(p: str, s: str = None) -> None:
        pri.append(p)
        sec.append(p if s is None else s)

    slavo = ("W" in st) or ("K" in st) or ("CZ" in st) or ("WITZ" in st)

    cur = 0
    if st[0:2] in ("GN", "KN", "PN", "WR", "PS"):
        cur += 1
    if at(0) == "X":                      # 'Xavier' begins with an S sound
        add("S")
        cur += 1

    while cur < n and (sum(map(len, pri)) < maxlen
                       or sum(map(len, sec)) < maxlen):
        c = at(cur)
        if c in VOWELS:
            if cur == 0:                  # all initial vowels map to A
                add("A")
            cur += 1
        elif c == "B":                    # B -> P; -MB handled at M
            add("P")
            cur += 2 if at(cur + 1) == "B" else 1
        elif c == "C":
            # Germanic -ACH- with non-vowel 2 back ('macher', not 'achieve')
            if (cur > 1 and not vow(cur - 2)
                    and sat(cur - 1, 3, ("ACH",))
                    and at(cur + 2) != "I"
                    and (at(cur + 2) != "E"
                         or sat(cur - 2, 6, ("BACHER", "MACHER")))):
                add("K")
                cur += 2
            elif cur == 0 and sat(cur, 6, ("CAESAR",)):
                add("S")
                cur += 2
            elif sat(cur, 4, ("CHIA",)):              # Italian 'chianti'
                add("K")
                cur += 2
            elif sat(cur, 2, ("CH",)):
                if cur > 0 and sat(cur, 4, ("CHAE",)):    # 'michael'
                    add("K", "X")
                elif (cur == 0
                      and (sat(cur + 1, 5, ("HARAC", "HARIS"))
                           or sat(cur + 1, 3, ("HOR", "HYM", "HIA",
                                               "HEM")))
                      and not sat(0, 5, ("CHORE",))):   # Greek roots
                    add("K")
                elif (sat(0, 4, ("VAN ", "VON "))
                      or sat(0, 3, ("SCH",))
                      or sat(cur - 2, 6, ("ORCHES", "ARCHIT", "ORCHID"))
                      or sat(cur + 2, 1, ("T", "S"))
                      or ((sat(cur - 1, 1, ("A", "O", "U", "E"))
                           or cur == 0)
                          and sat(cur + 2, 1,
                                  ("L", "R", "N", "M", "B", "H", "F",
                                   "V", "W", " ")))):  # 'kh' sound
                    add("K")
                elif cur > 0:
                    add("K" if sat(0, 2, ("MC",)) else "X",
                        "K")
                else:
                    add("X")
                cur += 2
            elif sat(cur, 2, ("CZ",)) and not sat(cur - 2, 4, ("WICZ",)):
                add("S", "X")                             # 'czerny'
                cur += 2
            elif sat(cur + 1, 3, ("CIA",)):               # 'focaccia'
                add("X")
                cur += 3
            elif sat(cur, 2, ("CC",)) and not (cur == 1 and at(0) == "M"):
                # 'bellocchio' / 'bacchus' / 'accident' / 'succeed'
                if (sat(cur + 2, 1, ("I", "E", "H"))
                        and not sat(cur + 2, 2, ("HU",))):
                    if ((cur == 1 and at(cur - 1) == "A")
                            or sat(cur - 1, 5, ("UCCEE", "UCCES"))):
                        add("KS")
                    else:
                        add("X")
                    cur += 3
                else:
                    add("K")
                    cur += 2
            elif sat(cur, 2, ("CK", "CG", "CQ")):
                add("K")
                cur += 2
            elif sat(cur, 2, ("CI", "CE", "CY")):
                if sat(cur, 3, ("CIO", "CIE", "CIA")):    # Italian vs.
                    add("S", "X")
                else:
                    add("S")
                cur += 2
            else:
                add("K")
                if sat(cur + 1, 2, (" C", " Q", " G")):   # 'mac caffrey'
                    cur += 3
                elif (sat(cur + 1, 1, ("C", "K", "Q"))
                        and not sat(cur + 1, 2, ("CE", "CI"))):
                    cur += 2
                else:
                    cur += 1
        elif c == "D":
            if sat(cur, 2, ("DG",)):
                if sat(cur + 2, 1, ("I", "E", "Y")):      # 'edge'
                    add("J")
                    cur += 3
                else:                                     # 'edgar'
                    add("TK")
                    cur += 2
            else:
                add("T")
                cur += 2 if sat(cur, 2, ("DT", "DD")) else 1
        elif c == "F":
            cur += 2 if at(cur + 1) == "F" else 1
            add("F")
        elif c == "G":
            if at(cur + 1) == "H":
                if cur > 0 and not vow(cur - 1):
                    add("K")
                    cur += 2
                elif cur == 0:
                    if at(cur + 2) == "I":                # 'ghislane'
                        add("J")
                    else:                                 # 'ghoulish'
                        add("K")
                    cur += 2
                # Parker's rule (+refinements): 'hugh', 'bough', 'broughton'
                elif ((cur > 1 and sat(cur - 2, 1, ("B", "H", "D")))
                      or (cur > 2 and sat(cur - 3, 1, ("B", "H", "D")))
                      or (cur > 3 and sat(cur - 4, 1, ("B", "H")))):
                    cur += 2
                else:
                    # 'laugh', 'cough', 'rough', 'tough'
                    if (cur > 2 and at(cur - 1) == "U"
                            and sat(cur - 3, 1, ("C", "G", "L", "R",
                                                 "T"))):
                        add("F")
                    elif cur > 0 and at(cur - 1) != "I":
                        add("K")
                    cur += 2
            elif at(cur + 1) == "N":
                if cur == 1 and vow(0) and not slavo:
                    add("KN", "N")
                elif (not sat(cur + 2, 2, ("EY",))
                        and at(cur + 1) != "Y" and not slavo):
                    add("N", "KN")
                else:
                    add("KN")
                cur += 2
            elif sat(cur + 1, 2, ("LI",)) and not slavo:  # 'tagliaro'
                add("KL", "L")
                cur += 2
            elif cur == 0 and (at(cur + 1) == "Y"
                               or sat(cur + 1, 2,
                                      ("ES", "EP", "EB", "EL", "EY",
                                       "IB", "IL", "IN", "IE", "EI",
                                       "ER"))):           # 'ges-' 'gep-' ...
                add("K", "J")
                cur += 2
            elif ((sat(cur + 1, 2, ("ER",)) or at(cur + 1) == "Y")
                  and not sat(0, 6, ("DANGER", "RANGER", "MANGER"))
                  and not sat(cur - 1, 1, ("E", "I"))
                  and not sat(cur - 1, 3, ("RGY", "OGY"))):
                add("K", "J")
                cur += 2
            elif (sat(cur + 1, 1, ("E", "I", "Y"))
                    or sat(cur - 1, 4, ("AGGI", "OGGI"))):
                if (sat(0, 4, ("VAN ", "VON ")) or sat(0, 3, ("SCH",))
                        or sat(cur + 1, 2, ("ET",))):     # Germanic
                    add("K")
                elif sat(cur + 1, 3, ("IER",)) and cur + 4 >= n:
                    add("J")                              # 'cagier' fr.
                else:
                    add("J", "K")
                cur += 2
            else:
                cur += 2 if at(cur + 1) == "G" else 1
                add("K")
        elif c == "H":
            # keep H only between vowels / word-initial before a vowel
            if (cur == 0 or vow(cur - 1)) and vow(cur + 1):
                add("H")
                cur += 2
            else:
                cur += 1
        elif c == "J":
            if sat(cur, 4, ("JOSE",)) or sat(0, 4, ("SAN ",)):
                if ((cur == 0 and at(cur + 4) == " ")
                        or sat(0, 4, ("SAN ",))):
                    add("H")                              # 'san jose'
                else:
                    add("J", "H")
                cur += 1
            else:
                if cur == 0:
                    add("J", "A")                         # 'yankelovich'
                elif (vow(cur - 1) and not slavo
                        and at(cur + 1) in ("A", "O")):
                    add("J", "H")
                elif cur == last:
                    add("J", "")
                elif (not sat(cur + 1, 1, ("L", "T", "K", "S", "N", "M",
                                           "B", "Z"))
                        and not sat(cur - 1, 1, ("S", "K", "L"))):
                    add("J")
                cur += 2 if at(cur + 1) == "J" else 1
        elif c == "K":
            cur += 2 if at(cur + 1) == "K" else 1
            add("K")
        elif c == "L":
            if at(cur + 1) == "L":
                # Spanish 'cabrillo', 'gallegos': alt drops the L
                if ((cur == n - 3
                        and sat(cur - 1, 4, ("ILLO", "ILLA", "ALLE")))
                        or ((sat(last - 1, 2, ("AS", "OS"))
                             or sat(last, 1, ("A", "O")))
                            and sat(cur - 1, 4, ("ALLE",)))):
                    add("L", "")
                else:
                    add("L")
                cur += 2
            else:
                add("L")
                cur += 1
        elif c == "M":
            if ((sat(cur - 1, 3, ("UMB",))
                    and (cur + 1 == last
                         or sat(cur + 2, 2, ("ER",))))    # 'dumb' 'thumber'
                    or at(cur + 1) == "M"):
                cur += 2
            else:
                cur += 1
            add("M")
        elif c == "N":
            cur += 2 if at(cur + 1) == "N" else 1
            add("N")
        elif c == "P":
            if at(cur + 1) == "H":
                add("F")
                cur += 2
            else:
                cur += 2 if sat(cur + 1, 1, ("P", "B")) else 1
                add("P")                                  # 'campbell'
        elif c == "Q":
            cur += 2 if at(cur + 1) == "Q" else 1
            add("K")
        elif c == "R":
            # French final -IER: 'rogier' (not 'hochmeier')
            if (cur == last and not slavo
                    and sat(cur - 2, 2, ("IE",))
                    and not sat(cur - 4, 2, ("ME", "MA"))):
                add("", "R")
            else:
                add("R")
            cur += 2 if at(cur + 1) == "R" else 1
        elif c == "S":
            if sat(cur - 1, 3, ("ISL", "YSL")):           # 'island'
                cur += 1
            elif cur == 0 and sat(cur, 5, ("SUGAR",)):
                add("X", "S")
                cur += 1
            elif sat(cur, 2, ("SH",)):
                if sat(cur + 1, 4, ("HEIM", "HOEK", "HOLM", "HOLZ")):
                    add("S")                              # Germanic
                else:
                    add("X")
                cur += 2
            elif (sat(cur, 3, ("SIO", "SIA"))
                    or sat(cur, 4, ("SIAN",))):
                if slavo:
                    add("S")
                else:
                    add("S", "X")                         # '-sion'
                cur += 3
            elif ((cur == 0 and sat(cur + 1, 1, ("M", "N", "L", "W")))
                    or sat(cur + 1, 1, ("Z",))):
                # 'smith' -> SM/XM; '-sz-' Germanic
                add("S", "X")
                cur += 2 if sat(cur + 1, 1, ("Z",)) else 1
            elif sat(cur, 2, ("SC",)):
                if at(cur + 2) == "H":
                    if sat(cur + 3, 2, ("OO", "ER", "EN", "UY", "ED",
                                        "EM")):
                        if sat(cur + 3, 2, ("ER", "EN")):
                            add("X", "SK")                # 'schermerhorn'
                        else:
                            add("SK")                     # 'school'
                    elif cur == 0 and not vow(3) and at(3) != "W":
                        add("X", "S")
                    else:
                        add("X")
                    cur += 3
                elif sat(cur + 2, 1, ("I", "E", "Y")):
                    add("S")
                    cur += 3
                else:
                    add("SK")
                    cur += 3
            else:
                if cur == last and sat(cur - 2, 2, ("AI", "OI")):
                    add("", "S")                          # 'louis'
                else:
                    add("S")
                cur += 2 if sat(cur + 1, 1, ("S", "Z")) else 1
        elif c == "T":
            if sat(cur, 4, ("TION",)) or sat(cur, 3, ("TIA", "TCH")):
                add("X")
                cur += 3
            elif sat(cur, 2, ("TH",)) or sat(cur, 3, ("TTH",)):
                if (sat(cur + 2, 2, ("OM", "AM"))         # 'thomas'
                        or sat(0, 4, ("VAN ", "VON "))
                        or sat(0, 3, ("SCH",))):
                    add("T")
                else:
                    add("0", "T")
                cur += 2
            else:
                cur += 2 if sat(cur + 1, 1, ("T", "D")) else 1
                add("T")
        elif c == "V":
            cur += 2 if at(cur + 1) == "V" else 1
            add("F")
        elif c == "W":
            if sat(cur, 2, ("WR",)):
                add("R")
                cur += 2
            elif cur == 0 and (vow(cur + 1) or sat(cur, 2, ("WH",))):
                if vow(cur + 1):
                    add("A", "F")                         # 'wasserman'
                else:
                    add("A")                              # 'wharton'
                cur += 1
            elif ((cur == last and vow(cur - 1))
                    or sat(cur - 1, 5, ("EWSKI", "EWSKY", "OWSKI",
                                        "OWSKY"))
                    or sat(0, 3, ("SCH",))):
                add("", "F")                              # alt: '-owski'
                cur += 1
            elif sat(cur, 4, ("WICZ", "WITZ")):
                add("TS", "FX")
                cur += 4
            else:
                cur += 1
        elif c == "X":
            # French final -eaux/-oux stays silent
            if not (cur == last
                    and (sat(cur - 3, 3, ("IAU", "EAU"))
                         or sat(cur - 2, 2, ("AU", "OU")))):
                add("KS")
            cur += 2 if sat(cur + 1, 1, ("C", "X")) else 1
        elif c == "Z":
            if at(cur + 1) == "H":
                add("J")                                  # Pinyin 'zhao'
                cur += 2
            else:
                if (sat(cur + 1, 2, ("ZO", "ZI", "ZA"))
                        or (slavo and cur > 0 and at(cur - 1) != "T")):
                    add("S", "TS")
                else:
                    add("S")
                cur += 2 if at(cur + 1) == "Z" else 1
        else:
            cur += 1

    return "".join(pri)[:maxlen], "".join(sec)[:maxlen]
