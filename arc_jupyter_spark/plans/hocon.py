"""Minimal HOCON parser for Arc cell configs.

The reference's ``%arc`` / bare-cell language is HOCON (typesafe
config: ``ArcInterpreter.scala:404`` splices cell text into a HOCON
document parsed with ``ConfigFactory``; ``ConfigSyntax.CONF`` at
:460). Arc notebook cells therefore use unquoted keys, ``=`` or ``:``
separators, ``#``/``//`` comments, optional commas, triple-quoted SQL
strings, and ``${ENV_VAR}`` substitution — none of which
``json.loads`` accepts.

This implements the subset those cells actually use (pyhocon is not
available in this environment):

- objects ``{...}`` / arrays ``[...]`` with newline OR comma
  separators; braceless root objects; multiple concatenated root
  objects (one per stage) parse to a list
- ``key = v``, ``key: v``, ``key { ... }``; dotted keys nest;
  duplicate object keys deep-merge (last wins for scalars)
- ``"strings"`` with JSON escapes, ``\"\"\"triple-quoted\"\"\"`` raw
  strings, unquoted scalars (bool/null/number sniffed, else string)
- ``${PATH}`` / ``${?PATH}`` substitution resolved against the
  provided env mapping (default ``os.environ``); same-line value
  concatenation (``${BASE}"/file.csv"``) joins as strings
- no ``include`` and no ``+=`` (Arc cells don't use them)
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Mapping

__all__ = ["parse_hocon", "HoconError"]

_UNQUOTED_END = set(',\n#]}')
_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


class HoconError(ValueError):
    pass


class _MISSING:
    """Sentinel for `${?x}` with no binding (key is dropped)."""


class _Parser:
    def __init__(self, text: str, env: Mapping[str, str]):
        self.s = text
        self.n = len(text)
        self.i = 0
        self.env = env

    # -- scanning ----------------------------------------------------

    def _err(self, msg: str) -> HoconError:
        line = self.s.count("\n", 0, self.i) + 1
        return HoconError(f"HOCON parse error at line {line}: {msg}")

    def skip_space(self, newlines: bool = True) -> None:
        """Skip whitespace and comments. With newlines=False, stop at
        a newline (HOCON value concatenation is same-line only)."""
        while self.i < self.n:
            c = self.s[self.i]
            if c == "\n" and not newlines:
                return
            if c.isspace():
                self.i += 1
            elif c == "#" or self.s.startswith("//", self.i):
                while self.i < self.n and self.s[self.i] != "\n":
                    self.i += 1
            else:
                return

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    # -- top level ---------------------------------------------------

    def parse_root(self) -> Any:
        self.skip_space()
        if self.peek() == "[":
            out = self.parse_array()
            self.skip_space()
            if self.i < self.n:
                raise self._err("trailing content after array")
            return out
        if self.peek() == "{":
            objs = []
            while True:
                self.skip_space()
                if self.i >= self.n:
                    break
                if self.peek() != "{":
                    raise self._err(f"expected '{{', found {self.peek()!r}")
                objs.append(self.parse_object())
            return objs[0] if len(objs) == 1 else objs
        # braceless root object
        obj = self.parse_object_body(closer=None)
        return obj

    # -- composite values --------------------------------------------

    def parse_object(self) -> dict:
        assert self.peek() == "{"
        self.i += 1
        return self.parse_object_body(closer="}")

    def parse_object_body(self, closer: str | None) -> dict:
        out: dict[str, Any] = {}
        while True:
            self.skip_space()
            if self.i >= self.n:
                if closer:
                    raise self._err(f"unexpected end of input, expected '{closer}'")
                return out
            c = self.peek()
            if closer and c == closer:
                self.i += 1
                return out
            if c == ",":
                self.i += 1
                continue
            key = self.parse_key()
            self.skip_space(newlines=False)
            c = self.peek()
            if c == "{":
                value: Any = self.parse_object()
            elif c in ("=", ":"):
                self.i += 1
                self.skip_space(newlines=False)
                value = self.parse_value()
            else:
                raise self._err(f"expected '=', ':' or '{{' after key {key!r}")
            if value is not _MISSING:
                self._assign(out, key.split("."), value)

    def parse_array(self) -> list:
        assert self.peek() == "["
        self.i += 1
        out = []
        while True:
            self.skip_space()
            if self.i >= self.n:
                raise self._err("unexpected end of input, expected ']'")
            c = self.peek()
            if c == "]":
                self.i += 1
                return out
            if c == ",":
                self.i += 1
                continue
            v = self.parse_value()
            if v is not _MISSING:
                out.append(v)

    def _assign(self, obj: dict, path: list[str], value: Any) -> None:
        for seg in path[:-1]:
            nxt = obj.get(seg)
            if not isinstance(nxt, dict):
                nxt = {}
                obj[seg] = nxt
            obj = nxt
        key = path[-1]
        if isinstance(value, dict) and isinstance(obj.get(key), dict):
            _deep_merge(obj[key], value)
        else:
            obj[key] = value

    # -- scalar values ------------------------------------------------

    def parse_key(self) -> str:
        c = self.peek()
        if c == '"':
            return str(self.parse_quoted())
        start = self.i
        while self.i < self.n and (
            self.s[self.i].isalnum() or self.s[self.i] in "._-"
        ):
            self.i += 1
        if self.i == start:
            raise self._err(f"expected a key, found {c!r}")
        return self.s[start:self.i]

    def parse_value(self) -> Any:
        """One value = same-line sequence of atoms; multiple atoms
        concatenate as strings (``${BASE}"/x.csv"``)."""
        atoms = [self.parse_atom()]
        while True:
            self.skip_space(newlines=False)
            c = self.peek()
            if c in ("", "\n", ",", "}", "]", "#") or self.s.startswith("//", self.i):
                break
            atoms.append(self.parse_atom())
        atoms = [a for a in atoms if a is not _MISSING]
        if not atoms:
            return _MISSING
        if len(atoms) == 1:
            return atoms[0]
        return "".join(str(a) for a in atoms)

    def parse_atom(self) -> Any:
        c = self.peek()
        if c == "{":
            return self.parse_object()
        if c == "[":
            return self.parse_array()
        if c == '"':
            return self.parse_quoted()
        if self.s.startswith("${", self.i):
            return self.parse_substitution()
        # unquoted scalar: runs to a delimiter or end of line
        start = self.i
        while self.i < self.n and self.s[self.i] not in _UNQUOTED_END:
            if self.s.startswith("//", self.i) or self.s.startswith("${", self.i):
                break
            self.i += 1
        tok = self.s[start:self.i].strip()
        if not tok:
            raise self._err("expected a value")
        return _coerce(tok)

    def parse_quoted(self) -> str:
        if self.s.startswith('"""', self.i):
            end = self.s.find('"""', self.i + 3)
            if end < 0:
                raise self._err("unterminated triple-quoted string")
            out = self.s[self.i + 3:end]
            self.i = end + 3
            return out
        # JSON string (reuse json for escape handling)
        m = re.compile(r'"(?:[^"\\]|\\.)*"').match(self.s, self.i)
        if not m:
            raise self._err("unterminated string")
        self.i = m.end()
        return json.loads(m.group(0))

    def parse_substitution(self) -> Any:
        end = self.s.find("}", self.i)
        if end < 0:
            raise self._err("unterminated ${...} substitution")
        body = self.s[self.i + 2:end].strip()
        self.i = end + 1
        optional = body.startswith("?")
        name = body[1:].strip() if optional else body
        # Arc notebook extension on top of HOCON: ${name=default}
        # falls back to the inline default when the name is unbound
        # (Common.scala:151-160 applies the same form to SQL text)
        default = None
        if "=" in name:
            name, default = (s.strip() for s in name.split("=", 1))
        if name in self.env:
            return _coerce(str(self.env[name]))
        if default is not None:
            return _coerce(default)
        if optional:
            return _MISSING
        raise self._err(f"unresolved substitution ${{{name}}}")


def _coerce(tok: str) -> Any:
    low = tok.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low == "null":
        return None
    if _NUM_RE.match(tok):
        try:
            return int(tok)
        except ValueError:
            return float(tok)
    return tok


def _deep_merge(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v


def parse_hocon(text: str, env: Mapping[str, str] | None = None) -> Any:
    """Parse HOCON text into dict / list-of-dicts.

    ``env`` resolves ``${NAME}`` substitutions (default
    ``os.environ``). A cell holding several concatenated ``{...}``
    stage objects returns a list, matching Arc's cell-per-stage(s)
    convention.
    """
    return _Parser(text, os.environ if env is None else env).parse_root()
