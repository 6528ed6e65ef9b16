"""Java SimpleDateFormat pattern -> Spark (DateTimeFormatter) pattern shim.

The reference formats/parses with ``java.text.SimpleDateFormat``
(``SystemFunctionUtils.java:105-145`` DATE_FORMAT / TO_DATE / TO_TIMESTAMP),
while Spark >= 3.0 uses ``java.time.DateTimeFormatter`` patterns. The two
dialects agree on the common letters (y M d H m s) but diverge on a few:

| SimpleDateFormat | meaning              | DateTimeFormatter |
|------------------|----------------------|-------------------|
| ``u``            | day number of week   | ``e``             |
| ``S``            | millisecond          | ``S`` (fraction — same rendering for SSS) |
| ``z``/``Z``      | tz name / RFC offset | kept as-is        |
| ``Y``            | week year            | ``Y`` (same)      |

Additionally SimpleDateFormat is lenient about pattern-letter counts where
DateTimeFormatter throws (e.g. ``yyyyy``); we clamp known letters to their
maximum legal Spark run length.
"""

from __future__ import annotations

import re

_TRANSLATE = {"u": "e"}
# Max run-lengths DateTimeFormatter accepts for the letters the reference
# documents (docs/content/docs/core-concept/transform.md).
_MAX_RUN = {"y": 4, "M": 3, "d": 2, "H": 2, "h": 2, "m": 2, "s": 2, "a": 1, "E": 4}


def translate_java_pattern(pattern: str) -> str:
    """Translate a SimpleDateFormat pattern string to a Spark-safe pattern."""
    out: list[str] = []
    i = 0
    n = len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "'":
            # literal section: copy verbatim through closing quote
            j = i + 1
            while j < n:
                if pattern[j] == "'":
                    if j + 1 < n and pattern[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(pattern[i : j + 1])
            i = j + 1
            continue
        if ch.isalpha():
            j = i
            while j < n and pattern[j] == ch:
                j += 1
            run = j - i
            letter = _TRANSLATE.get(ch, ch)
            if letter in _MAX_RUN and run > _MAX_RUN[letter] and letter != "y":
                run = _MAX_RUN[letter]
            out.append(letter * run)
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)
