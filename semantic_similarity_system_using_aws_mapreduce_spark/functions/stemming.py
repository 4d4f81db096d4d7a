"""Porter stemmer (Porter 1980, "An algorithm for suffix stripping").

Pure-Python implementation of the classic public-domain Porter algorithm,
written to be behavior-identical to the reference's stemmer
(/root/reference Stemmer.java:46-379, itself the canonical public-domain
Java release), including:

  * the ``stem_word`` wrapper semantics (Stemmer.java:367-379): lowercase
    first; words not matching ``[a-z]+`` are returned unchanged (after
    lowercasing); and
  * the length guard (Stemmer.java:358): words of length <= 2 are never
    stemmed.

NLTK's PorterStemmer applies extra extensions (martin-blessed "NLTK mode")
and is NOT bit-identical, so we keep our own ~120-line implementation.

Performance: this is the engine's only Python scalar function in the hot
path.  It is exposed as an Arrow-batched pandas UDF with a per-batch
memo cache — natural-language token distributions are Zipfian, so the
cache hit rate is very high.  Architecturally it is quarantined in the
ingest stage (apply once, persist) so downstream plans stay fully
JVM-native (SURVEY.md §4).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOWER_ALPHA = re.compile(r"^[a-z]+$")
_VOWELS = frozenset("aeiou")


class _Porter:
    """One stemming pass over a single lowercase word.

    ``b`` is the char buffer; ``k`` the index of the last live char;
    ``j`` a scratch index set by :meth:`ends` (suffix start - 1).
    """

    __slots__ = ("b", "k", "j")

    def __init__(self, word: str) -> None:
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    def cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    def m(self) -> int:
        """Number of consonant-vowel sequences in b[0..j]."""
        n = 0
        i = 0
        while True:
            if i > self.j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > self.j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > self.j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowel_in_stem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    def doublec(self, j: int) -> bool:
        if j < 1 or self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    def cvc(self, i: int) -> bool:
        if i < 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def ends(self, s: str) -> bool:
        o = self.k - len(s) + 1
        if o < 0:
            return False
        if "".join(self.b[o : self.k + 1]) != s:
            return False
        self.j = self.k - len(s)
        return True

    def setto(self, s: str) -> None:
        o = self.j + 1
        for i, ch in enumerate(s):
            if o + i < len(self.b):
                self.b[o + i] = ch
            else:
                self.b.append(ch)
        self.k = self.j + len(s)

    def r(self, s: str) -> None:
        if self.m() > 0:
            self.setto(s)

    def step1(self) -> None:
        """Plurals and -ed/-ing (paper step 1a/1b)."""
        if self.b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and self.vowel_in_stem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                self.k -= 1
                if self.b[self.k] in ("l", "s", "z"):
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.setto("e")

    def step2(self) -> None:
        """Terminal y -> i when the stem has a vowel (paper step 1c)."""
        if self.ends("y") and self.vowel_in_stem():
            self.b[self.k] = "i"

    _STEP3 = {
        "a": [("ational", "ate"), ("tional", "tion")],
        "c": [("enci", "ence"), ("anci", "ance")],
        "e": [("izer", "ize")],
        "l": [("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous")],
        "o": [("ization", "ize"), ("ation", "ate"), ("ator", "ate")],
        "s": [("alism", "al"), ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous")],
        "t": [("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")],
        "g": [("logi", "log")],
    }

    def step3(self) -> None:
        """Double suffixes -> single (paper step 2)."""
        if self.k == 0:
            return
        for suffix, repl in self._STEP3.get(self.b[self.k - 1], ()):
            if self.ends(suffix):
                self.r(repl)
                return

    _STEP4 = {
        "e": [("icate", "ic"), ("ative", ""), ("alize", "al")],
        "i": [("iciti", "ic")],
        "l": [("ical", "ic"), ("ful", "")],
        "s": [("ness", "")],
    }

    def step4(self) -> None:
        """-ic-, -full, -ness etc. (paper step 3)."""
        for suffix, repl in self._STEP4.get(self.b[self.k], ()):
            if self.ends(suffix):
                self.r(repl)
                return

    _STEP5 = {
        "a": ["al"],
        "c": ["ance", "ence"],
        "e": ["er"],
        "i": ["ic"],
        "l": ["able", "ible"],
        "n": ["ant", "ement", "ment", "ent"],
        "s": ["ism"],
        "t": ["ate", "iti"],
        "u": ["ous"],
        "v": ["ive"],
        "z": ["ize"],
    }

    def step5(self) -> None:
        """-ant, -ence etc. in context <c>vcvc<v> (paper step 4)."""
        if self.k == 0:
            return
        ch = self.b[self.k - 1]
        if ch == "o":
            # -ion only after s/t; -ou handles -ous.
            matched = (
                self.ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t")
            ) or self.ends("ou")
            if not matched:
                return
        else:
            for suffix in self._STEP5.get(ch, ()):
                if self.ends(suffix):
                    break
            else:
                return
        if self.m() > 1:
            self.k = self.j

    def step6(self) -> None:
        """Final -e / -ll removal (paper step 5a/5b)."""
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1

    def result(self) -> str:
        if self.k > 1:
            self.step1()
            self.step2()
            self.step3()
            self.step4()
            self.step5()
            self.step6()
        return "".join(self.b[: self.k + 1])


def porter_stem(word: str) -> str:
    """Stem one word with the reference's wrapper semantics
    (Stemmer.java:367-379): lowercase; non-``[a-z]+`` words pass
    through unchanged."""
    word = word.lower()
    if not _LOWER_ALPHA.match(word):
        return word
    return _Porter(word).result()


@F.pandas_udf(T.StringType())
def stem_udf(words: pd.Series) -> pd.Series:
    """Arrow-batched stemmer with per-batch memoization.

    Token frequency is Zipfian, so mapping through a dict of the
    batch's distinct values does far less Python work than stemming
    each row; Arrow keeps the transfer columnar.
    """
    cache: dict[str, str] = {}

    def _stem(w: str) -> str:
        if w is None:
            return None
        hit = cache.get(w)
        if hit is None:
            hit = cache[w] = porter_stem(w)
        return hit

    return words.map(_stem)
