"""Metric glob → regex translation for catalog `find` (op #12).

Reference: ``CeresTree.find`` (ceres.py ≈L240-265) translates the
dot-delimited node pattern to a filesystem path and hands it to
``glob.glob`` — i.e. fnmatch semantics per path segment: ``*`` and
``?`` match within a segment only (they never cross ``os.sep``, which
is the translated ``.``), ``[seq]``/``[!seq]`` character classes.
``{a,b}`` brace expansion is a graphite-web layer, NOT ceres, so it
is deliberately absent here too.

This is driver-side planning logic (pure Python, no Spark): the
resulting anchored regex feeds ``col('metric').rlike(rx)`` against
the (small, broadcastable) metric catalog.
"""

from __future__ import annotations

import re


def glob_to_regex(pattern: str) -> str:
    """Translate a ceres node glob into an anchored Java-compatible
    regex. ``*``/``?`` stop at ``.`` (segment separators), matching
    glob.glob's per-directory expansion."""
    out = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            out.append(r"[^.]*")
        elif c == "?":
            out.append(r"[^.]")
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] == "!":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j >= n:
                # unterminated '[' — fnmatch treats it as a literal
                out.append(re.escape(c))
            else:
                inner = pattern[i + 1 : j]
                if inner.startswith("!"):
                    inner = "^" + inner[1:]
                # escape regex-special chars inside the class except
                # a leading ^ and ranges
                inner = inner.replace("\\", r"\\")
                out.append(f"[{inner}]")
                i = j
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"
