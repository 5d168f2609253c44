"""robots.txt (Robots Exclusion Protocol) parsing + matching - crawl
politeness, the gate every fetch passes before a page ever reaches the
pipeline.

Honest subset (the original 1994 REP plus the allow extension, as
standardized in RFC 9309's core):

  * ``User-agent`` groups (consecutive UA lines share the following rules);
  * ``Allow`` / ``Disallow`` with LITERAL PATH PREFIX matching ('' never
    matches; '/' matches everything);
  * precedence: the LONGEST matching rule wins; on equal length Allow
    wins (RFC 9309 section 2.4.2 / Google's documented tie-break);
  * group selection: the group whose UA token exactly equals the crawler
    name (case-insensitive), else the ``*`` group; no match -> allowed;
  * comments (#), blank lines, unknown directives skipped.

``$``-anchors and ``*``-wildcards inside paths are RFC extensions OUTSIDE
this subset: a rule containing either is dropped with the conservative
consequence documented here (the rule simply does not match), never
half-interpreted.  No reference anchor - public RFC 9309.
"""

from __future__ import annotations


def parse_robots(text: str) -> list[tuple[str, str, str]]:
    """[(ua_lower, kind, path_prefix)] with kind in {'allow', 'disallow'};
    rules attach to every UA of the group header block above them."""
    rules: list[tuple[str, str, str]] = []
    uas: list[str] = []
    last_was_rule = True  # a UA line after rules starts a NEW group
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if last_was_rule:
                uas = []
            uas.append(val.lower())
            last_was_rule = False
        elif key in ("allow", "disallow"):
            last_was_rule = True
            if not val and key == "disallow":
                # "Disallow:" (empty) = allow all: representable as a
                # zero-length rule that never outranks any real match
                continue
            if "*" in val or "$" in val:
                continue  # wildcard/anchor extensions: outside the subset
            for ua in uas:
                rules.append((ua, key, val))
        else:
            last_was_rule = True
    return rules


def is_allowed(rules: list[tuple[str, str, str]], ua: str, path: str) -> bool:
    """RFC 9309 longest-match decision for `path` under crawler `ua`."""
    ua = ua.lower()
    group = [r for r in rules if r[0] == ua]
    if not group:
        group = [r for r in rules if r[0] == "*"]
    best_len = -1
    best_allow = True
    for _, kind, prefix in group:
        if prefix and path.startswith(prefix):
            ln = len(prefix)
            allow = kind == "allow"
            if ln > best_len or (ln == best_len and allow):
                best_len = ln
                best_allow = allow
    return best_allow
