"""Java SimpleDateFormat pattern -> Spark (DateTimeFormatter) pattern shim.

The reference formats/parses with ``java.text.SimpleDateFormat``
(``SystemFunctionUtils.java:105-145`` DATE_FORMAT / TO_DATE / TO_TIMESTAMP),
while Spark >= 3.0 uses ``java.time.DateTimeFormatter`` patterns. The two
dialects agree on the common letters (y M d H m s S E a z); the known
divergence is ``u`` (SimpleDateFormat: day number of week; DateTimeFormatter
uses ``e``). Run lengths are passed through unchanged — DateTimeFormatter
accepts the same padding semantics for these letters (``MMMM`` = full month
name in both, ``yyyyy`` = pad-to-5 in both).
"""

from __future__ import annotations

_TRANSLATE = {"u": "e"}


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
            out.append(_TRANSLATE.get(ch, ch) * (j - i))
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)
