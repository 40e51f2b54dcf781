"""``${param}`` / ``${param=default}`` substitution for SQL text.

Reference semantics: Common.scala:151-160 — regex
``[$][{]\\s*key\\s*(?:=default)?[}]`` replaced by the supplied value,
falling back to the inline default when the key is absent. Unresolved
placeholders (no value, no default) are left intact so the SQL engine
surfaces a clear error.
"""

from __future__ import annotations

import re

_PLACEHOLDER = re.compile(r"[$][{]\s*([A-Za-z0-9_]+)\s*(?:=([^}]*))?[}]")


def inject_parameters(sql: str, params: dict[str, str] | None) -> str:
    """Substitute ``${key}`` / ``${key=default}`` placeholders in *sql*."""
    params = params or {}

    def _sub(match: re.Match[str]) -> str:
        key = match.group(1)
        default = match.group(2)
        if key in params:
            return str(params[key])
        if default is not None:
            return default
        return match.group(0)

    return _PLACEHOLDER.sub(_sub, sql)


def unresolved_parameters(sql: str, params: dict[str, str] | None) -> list[str]:
    """Names of placeholders that have neither a value nor a default."""
    params = params or {}
    out = []
    for match in _PLACEHOLDER.finditer(sql):
        if match.group(1) not in params and match.group(2) is None:
            out.append(match.group(1))
    return out
