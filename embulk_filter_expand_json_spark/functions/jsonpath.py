"""Self-contained JsonPath engine, Jayway-compatible for the reference's grammar.

The reference evaluates Jayway JsonPath 2.4.0 expressions per row
(/root/reference FilteredPageOutput.java:340; grammar exercised at
TestExpandJsonFilterPlugin.java:606-610, 664-674). No Spark builtin covers
filters / regex / recursive descent with root back-references, and
``jsonpath_ng.ext`` rejects ``$``-root references inside filters and the
``=~ /re/flags`` operator — so this module implements the needed grammar
directly:

- dot + bracket child access: ``$.a.b``, ``$['a']["b"]``
- array index (incl. negative), index unions, slices: ``[2]``, ``[0,2]``, ``[1:3]``
- wildcard ``[*]`` / ``.*``
- recursive descent: ``..name``, ``..[...]``
- filter predicates ``[?(...)]`` with ``@``-relative and ``$``-root paths,
  comparisons ``== != < <= > >= =~``, ``&& || !``, ``in``/``nin``,
  ``size``/``empty``, existence (``[?(@.isbn)]``), regex literals
  ``/pattern/flags``
- tail functions (Jayway 2.4.0 path functions, config-compat long tail):
  ``.length()``, ``.keys()``, ``.min()``, ``.max()``, ``.avg()``,
  ``.sum()``, ``.stddev()``, and the parameterized ``.concat(...)`` /
  ``.append(...)`` (literal or $-rooted-path arguments, Jayway
  Parameter semantics) — legal only as the last step; on an
  indefinite base path a single match is unwrapped first (so
  ``$..book.length()`` counts the books, matching Jayway's documented
  output), multiple matches aggregate over the match list

Read semantics replicate the two Jayway options the reference sets
(FilteredPageOutput.java:223-229): DEFAULT_PATH_LEAF_TO_NULL and
SUPPRESS_EXCEPTIONS — a *definite* path (no wildcard/descent/filter/union)
returns the single value or ``None`` when absent; an *indefinite* path
returns the list of matches in document order (``[]`` when none).

Compiled once per executor closure — strictly better than the reference's
contended global LRU cache (ExpandJsonFilterPlugin.java:210-243,
README.md:81-98).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple


class JsonPathSyntaxError(ValueError):
    pass


_MISSING = object()  # sentinel: path step found nothing


# ---------------------------------------------------------------------------
# AST nodes
# ---------------------------------------------------------------------------

class Step:
    definite = False


@dataclass(frozen=True)
class Field(Step):
    name: str
    definite = True


@dataclass(frozen=True)
class Index(Step):
    index: int
    definite = True


@dataclass(frozen=True)
class IndexUnion(Step):
    indexes: Tuple[int, ...]


@dataclass(frozen=True)
class FieldUnion(Step):
    names: Tuple[str, ...]

    @property
    def single(self) -> bool:
        return len(self.names) == 1


@dataclass(frozen=True)
class Slice(Step):
    start: Optional[int]
    stop: Optional[int]
    step: Optional[int]


class Wildcard(Step):
    def __repr__(self) -> str:  # pragma: no cover
        return "Wildcard()"


@dataclass(frozen=True)
class RecursiveField(Step):
    name: str


class RecursiveAll(Step):
    """Bare ``..`` before a bracket selector: visit every node."""

    def __repr__(self) -> str:  # pragma: no cover
        return "RecursiveAll()"


@dataclass(frozen=True)
class Filter(Step):
    expr: "Expr"


#: Jayway 2.4.0 path functions (PathFunctionFactory.FUNCTIONS). length/keys
#: and the numeric aggregations take no arguments; concat/append take a
#: comma-separated parameter list (string/number/bool literals or $-rooted
#: paths evaluated against the document root, as Jayway Parameters are).
_TAIL_FUNCTIONS = ("length", "keys", "min", "max", "avg", "sum", "stddev")
_PARAM_TAIL_FUNCTIONS = ("concat", "append")


@dataclass(frozen=True)
class TailFunction(Step):
    name: str
    #: each arg is ("lit", value) or ("path", steps-tuple)
    args: Tuple[Tuple[str, Any], ...] = ()


# --- filter expression AST --------------------------------------------------

class Expr:
    pass


@dataclass(frozen=True)
class Literal(Expr):
    value: Any


@dataclass(frozen=True)
class Regex(Expr):
    pattern: str
    flags: int


@dataclass(frozen=True)
class SubPath(Expr):
    """``@``-relative (root=False) or ``$``-root (root=True) path operand."""

    steps: Tuple[Step, ...]
    root: bool


@dataclass(frozen=True)
class BinOp(Expr):
    op: str
    left: Expr
    right: Expr


@dataclass(frozen=True)
class BoolOp(Expr):
    op: str  # 'and' | 'or'
    operands: Tuple[Expr, ...]


@dataclass(frozen=True)
class Not(Expr):
    operand: Expr


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_IDENT_RE = re.compile(r"[^.\[\]\s]+")
#: parameterized Jayway path functions: '.concat(' / '.append(' — matched
#: BEFORE the generic ident so the argument list gets a real parse
_PARAM_FN_RE = re.compile(r"(concat|append)\(")
_NUMBER_LIT_RE = re.compile(r"-?\d+(\.\d+)?")
_NUM_RE = re.compile(r"-?\d+(\.\d+)?([eE][+-]?\d+)?")


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.i = 0

    # -- low-level helpers --------------------------------------------------
    def peek(self) -> str:
        return self.text[self.i] if self.i < len(self.text) else ""

    def startswith(self, s: str) -> bool:
        return self.text.startswith(s, self.i)

    def skip_ws(self) -> None:
        while self.i < len(self.text) and self.text[self.i] in " \t":
            self.i += 1

    def expect(self, s: str) -> None:
        if not self.startswith(s):
            raise JsonPathSyntaxError(
                f"expected {s!r} at {self.i} in {self.text!r}"
            )
        self.i += len(s)

    # -- path ----------------------------------------------------------------
    def parse_path(self) -> Tuple[Step, ...]:
        self.skip_ws()
        self.expect("$")
        steps = self.parse_steps(top=True)
        self.skip_ws()
        if self.i != len(self.text):
            raise JsonPathSyntaxError(
                f"trailing input at {self.i} in {self.text!r}"
            )
        for s in steps[:-1]:
            if isinstance(s, TailFunction):
                raise JsonPathSyntaxError(
                    f"function .{s.name}() must be the last step in "
                    f"{self.text!r} (Jayway: functions apply at the tail)"
                )
        return steps

    def parse_steps(self, top: bool) -> Tuple[Step, ...]:
        """Parse steps until input ends (top) or a non-path token appears."""
        steps: List[Step] = []
        while True:
            if self.startswith(".."):
                self.i += 2
                if self.peek() == "[":
                    steps.append(RecursiveAll())
                    continue
                if self.peek() == "*":
                    self.i += 1
                    steps.append(RecursiveAll())
                    continue
                m = _IDENT_RE.match(self.text, self.i)
                if not m:
                    raise JsonPathSyntaxError(f"bad '..' at {self.i}")
                name = self._trim_ident(m.group(0), top)
                self.i += len(name)
                steps.append(RecursiveField(name))
            elif self.peek() == ".":
                self.i += 1
                if self.peek() == "*":
                    self.i += 1
                    steps.append(Wildcard())
                    continue
                pm = _PARAM_FN_RE.match(self.text, self.i)
                if pm:
                    self.i = pm.end()
                    steps.append(
                        TailFunction(pm.group(1), self.parse_fn_args())
                    )
                    continue
                m = _IDENT_RE.match(self.text, self.i)
                if not m:
                    if top:
                        raise JsonPathSyntaxError(f"bad '.' at {self.i}")
                    self.i -= 1
                    break
                name = self._trim_ident(m.group(0), top)
                self.i += len(name)
                # Jayway path function: '.fn()' as the (validated-last) step
                if name.endswith("()") and name[:-2] in _TAIL_FUNCTIONS:
                    steps.append(TailFunction(name[:-2]))
                else:
                    steps.append(Field(name))
            elif self.peek() == "[":
                steps.append(self.parse_bracket())
            else:
                break
        return tuple(steps)

    def _trim_ident(self, raw: str, top: bool) -> str:
        """In filter sub-paths, stop idents at comparison/boolean operators.

        ``[?(@.price<10)]`` is legal Jayway with no spaces, so the ident must
        stop at the operator. But a cut is only taken when what FOLLOWS the
        operator is a syntactically valid continuation (an operand start, a
        regex, or a structural token); otherwise the ident is ambiguous —
        e.g. a field literally named ``a<b`` — and we raise, like Jayway,
        instead of silently evaluating the prefix field. Such fields must be
        bracket-quoted: ``@['a<b']``.
        """
        if top:
            return raw
        cut = len(raw)
        cut_op = None
        for op in ("==", "!=", "<=", ">=", "=~", "<", ">", "&&", "||", ")", ","):
            k = raw.find(op)
            if 0 <= k < cut:
                cut, cut_op = k, op
        if cut_op is None:
            return raw
        if cut == 0:
            raise JsonPathSyntaxError(
                f"empty identifier before {cut_op!r} at {self.i} in {self.text!r}"
            )
        if cut_op in (")", ",", "&&", "||"):
            # structural: the sub-path simply ends here (existence test /
            # boolean connective) — always a valid cut
            return raw[:cut]
        rest = raw[cut + len(cut_op):].lstrip()
        if not rest:
            # operand continues after whitespace in the source text — valid
            return raw[:cut]
        ok_starts = "@$'\"[(-+./0123456789"
        if rest[0] in ok_starts or any(
            rest.startswith(w) for w in ("true", "false", "null")
        ):
            return raw[:cut]
        raise JsonPathSyntaxError(
            f"ambiguous identifier {raw!r} at {self.i} in {self.text!r}: "
            f"{cut_op!r} is not followed by a valid operand — bracket-quote "
            "field names containing operator characters"
        )

    def parse_bracket(self) -> Step:
        self.expect("[")
        self.skip_ws()
        c = self.peek()
        if c == "*":
            self.i += 1
            self.skip_ws()
            self.expect("]")
            return Wildcard()
        if c == "?":
            self.i += 1
            self.skip_ws()
            self.expect("(")
            expr = self.parse_filter_expr()
            self.skip_ws()
            self.expect(")")
            self.skip_ws()
            self.expect("]")
            return Filter(expr)
        if c in "'\"":
            names = [self.parse_quoted()]
            self.skip_ws()
            while self.peek() == ",":
                self.i += 1
                self.skip_ws()
                names.append(self.parse_quoted())
                self.skip_ws()
            self.expect("]")
            if len(names) == 1:
                return Field(names[0])
            return FieldUnion(tuple(names))
        # numeric index / union / slice
        nums: List[Optional[int]] = []
        is_slice = False
        parts: List[Optional[int]] = []
        cur = ""
        while self.peek() and self.peek() != "]":
            ch = self.peek()
            if ch == ":":
                is_slice = True
                parts.append(int(cur) if cur.strip() else None)
                cur = ""
                self.i += 1
            elif ch == ",":
                nums.append(int(cur))
                cur = ""
                self.i += 1
            else:
                cur += ch
                self.i += 1
        self.expect("]")
        if is_slice:
            parts.append(int(cur) if cur.strip() else None)
            while len(parts) < 3:
                parts.append(None)
            return Slice(parts[0], parts[1], parts[2])
        if cur.strip():
            nums.append(int(cur))
        if not nums:
            raise JsonPathSyntaxError(f"empty bracket at {self.i}")
        if len(nums) == 1:
            return Index(nums[0])  # type: ignore[arg-type]
        return IndexUnion(tuple(n for n in nums if n is not None))

    def parse_fn_args(self) -> Tuple[Tuple[str, Any], ...]:
        """Argument list of a parameterized path function, '(' already
        consumed. Jayway Parameters are json literals or $-rooted paths
        ('$.a.concat("-", $.b)'); nested function calls are not part of
        the 2.4.0 grammar."""
        args: List[Tuple[str, Any]] = []
        self.skip_ws()
        while self.peek() != ")":
            if self.i >= len(self.text):
                raise JsonPathSyntaxError(
                    f"unterminated function arguments in {self.text!r}"
                )
            c = self.peek()
            if c in "'\"":
                args.append(("lit", self.parse_quoted()))
            elif c == "$":
                self.i += 1
                args.append(("path", self.parse_steps(top=False)))
            elif self.startswith("true"):
                self.i += 4
                args.append(("lit", True))
            elif self.startswith("false"):
                self.i += 5
                args.append(("lit", False))
            elif self.startswith("null"):
                self.i += 4
                args.append(("lit", None))
            else:
                m = _NUMBER_LIT_RE.match(self.text, self.i)
                if not m:
                    raise JsonPathSyntaxError(
                        f"bad function argument at {self.i} in {self.text!r}"
                    )
                self.i = m.end()
                tok = m.group(0)
                args.append(("lit", float(tok) if "." in tok else int(tok)))
            self.skip_ws()
            if self.peek() == ",":
                self.i += 1
                self.skip_ws()
            elif self.peek() != ")":
                raise JsonPathSyntaxError(
                    f"expected ',' or ')' at {self.i} in {self.text!r}"
                )
        self.i += 1  # consume ')'
        return tuple(args)

    def parse_quoted(self) -> str:
        q = self.peek()
        if q not in "'\"":
            raise JsonPathSyntaxError(f"expected quote at {self.i}")
        self.i += 1
        out = []
        while True:
            if self.i >= len(self.text):
                raise JsonPathSyntaxError("unterminated string")
            c = self.text[self.i]
            if c == "\\" and self.i + 1 < len(self.text):
                out.append(self.text[self.i + 1])
                self.i += 2
            elif c == q:
                self.i += 1
                return "".join(out)
            else:
                out.append(c)
                self.i += 1

    # -- filter expressions ---------------------------------------------------
    def parse_filter_expr(self) -> Expr:
        return self.parse_or()

    def parse_or(self) -> Expr:
        operands = [self.parse_and()]
        self.skip_ws()
        while self.startswith("||"):
            self.i += 2
            operands.append(self.parse_and())
            self.skip_ws()
        return operands[0] if len(operands) == 1 else BoolOp("or", tuple(operands))

    def parse_and(self) -> Expr:
        operands = [self.parse_comparison()]
        self.skip_ws()
        while self.startswith("&&"):
            self.i += 2
            operands.append(self.parse_comparison())
            self.skip_ws()
        return operands[0] if len(operands) == 1 else BoolOp("and", tuple(operands))

    def parse_comparison(self) -> Expr:
        self.skip_ws()
        if self.peek() == "!" and not self.startswith("!="):
            self.i += 1
            return Not(self.parse_comparison())
        if self.peek() == "(":
            self.i += 1
            inner = self.parse_or()
            self.skip_ws()
            self.expect(")")
            return inner
        left = self.parse_operand()
        self.skip_ws()
        for op in ("==", "!=", "<=", ">=", "=~", "<", ">",
                   "nin", "in", "size", "empty"):
            if self.startswith(op):
                self.i += len(op)
                self.skip_ws()
                if op == "=~":
                    right: Expr = self.parse_regex()
                else:
                    right = self.parse_operand()
                return BinOp(op, left, right)
        return left  # existence test

    def parse_operand(self) -> Expr:
        self.skip_ws()
        c = self.peek()
        if c == "@":
            self.i += 1
            return SubPath(self.parse_steps(top=False), root=False)
        if c == "$":
            self.i += 1
            return SubPath(self.parse_steps(top=False), root=True)
        if c in "'\"":
            return Literal(self.parse_quoted())
        if c == "[":
            # list literal, e.g. [?(@.a in ['x','y'])]
            self.i += 1
            items = []
            self.skip_ws()
            while self.peek() != "]":
                item = self.parse_operand()
                if not isinstance(item, Literal):
                    raise JsonPathSyntaxError(
                        f"only literals allowed in list at {self.i}"
                    )
                items.append(item.value)
                self.skip_ws()
                if self.peek() == ",":
                    self.i += 1
                    self.skip_ws()
            self.expect("]")
            return Literal(items)
        if self.startswith("true"):
            self.i += 4
            return Literal(True)
        if self.startswith("false"):
            self.i += 5
            return Literal(False)
        if self.startswith("null"):
            self.i += 4
            return Literal(None)
        m = _NUM_RE.match(self.text, self.i)
        if m:
            self.i = m.end()
            s = m.group(0)
            return Literal(float(s) if any(ch in s for ch in ".eE") else int(s))
        raise JsonPathSyntaxError(f"bad operand at {self.i} in {self.text!r}")

    def parse_regex(self) -> Regex:
        self.skip_ws()
        self.expect("/")
        pat = []
        while True:
            if self.i >= len(self.text):
                raise JsonPathSyntaxError("unterminated regex")
            c = self.text[self.i]
            if c == "\\" and self.i + 1 < len(self.text):
                pat.append(c)
                pat.append(self.text[self.i + 1])
                self.i += 2
            elif c == "/":
                self.i += 1
                break
            else:
                pat.append(c)
                self.i += 1
        flags = 0
        while self.peek() and self.peek() in "imsxU":
            f = self.peek()
            if f == "i":
                flags |= re.IGNORECASE
            elif f == "m":
                flags |= re.MULTILINE
            elif f == "s":
                flags |= re.DOTALL
            elif f == "x":
                flags |= re.VERBOSE
            self.i += 1
        return Regex("".join(pat), flags)


# ---------------------------------------------------------------------------
# Evaluator
# ---------------------------------------------------------------------------

def _walk(node: Any, out: List[Any]) -> None:
    """Pre-order document-order traversal of every node in the subtree."""
    out.append(node)
    if isinstance(node, dict):
        for v in node.values():
            _walk(v, out)
    elif isinstance(node, list):
        for v in node:
            _walk(v, out)


def _is_number(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _compare(op: str, lv: Any, rv: Any) -> bool:
    if op == "==":
        if _is_number(lv) and _is_number(rv):
            return float(lv) == float(rv)
        return type(lv) == type(rv) and lv == rv  # noqa: E721
    if op == "!=":
        return not _compare("==", lv, rv)
    if op in ("<", "<=", ">", ">="):
        if _is_number(lv) and _is_number(rv):
            a, b = float(lv), float(rv)
        elif isinstance(lv, str) and isinstance(rv, str):
            a, b = lv, rv  # type: ignore[assignment]
        else:
            return False
        if op == "<":
            return a < b
        if op == "<=":
            return a <= b
        if op == ">":
            return a > b
        return a >= b
    raise JsonPathSyntaxError(f"unknown comparison {op}")


class JsonPath:
    """A compiled JsonPath expression.

    ``read(doc)`` follows Jayway + the reference's options
    (DEFAULT_PATH_LEAF_TO_NULL, SUPPRESS_EXCEPTIONS): definite paths give the
    value or None; indefinite paths give the list of matches ([] if none).
    """

    __slots__ = ("path", "steps", "is_definite", "tail_fn", "tail_args")

    def __init__(self, path: str):
        self.path = path
        steps = _Parser(path).parse_path()
        self.tail_fn: Optional[str] = None
        self.tail_args: Tuple[Tuple[str, Any], ...] = ()
        if steps and isinstance(steps[-1], TailFunction):
            self.tail_fn = steps[-1].name
            self.tail_args = steps[-1].args
            steps = steps[:-1]
        self.steps = steps
        # a path ending in a function always yields a single value
        self.is_definite = self.tail_fn is not None or all(
            isinstance(s, (Field, Index)) for s in self.steps
        )

    def __repr__(self) -> str:  # pragma: no cover
        return f"JsonPath({self.path!r})"

    def read(self, doc: Any) -> Any:
        if self.tail_fn is not None:
            if all(isinstance(s, (Field, Index)) for s in self.steps):
                model = _read_definite(self.steps, doc)
                if model is _MISSING:
                    return None  # SUPPRESS_EXCEPTIONS -> null
            else:
                matches = _eval_steps(self.steps, [doc], doc)
                # single indefinite match unwraps (Jayway's documented
                # '$..book.length() -> 4'); several aggregate over the list
                model = matches[0] if len(matches) == 1 else matches
            return _apply_tail_fn(
                self.tail_fn, model, self.tail_args, doc
            )
        if self.is_definite:
            v = _read_definite(self.steps, doc)
            return None if v is _MISSING else v
        return _eval_steps(self.steps, [doc], doc)


def _read_definite(steps: Sequence[Step], node: Any) -> Any:
    """Walk a Field/Index-only chain; absent anywhere -> _MISSING
    (Jayway DEFAULT_PATH_LEAF_TO_NULL + SUPPRESS_EXCEPTIONS -> null)."""
    for step in steps:
        if isinstance(step, Field):
            if isinstance(node, dict) and step.name in node:
                node = node[step.name]
            else:
                return _MISSING
        else:  # Index
            k = step.index  # type: ignore[union-attr]
            if isinstance(node, list) and -len(node) <= k < len(node):
                node = node[k]
            else:
                return _MISSING
    return node


def _eval_steps(steps: Sequence[Step], current: List[Any], root: Any) -> List[Any]:
    """Indefinite evaluation: non-matching elements are dropped silently."""
    for step in steps:
        nxt: List[Any] = []
        if isinstance(step, Field):
            for c in current:
                if isinstance(c, dict) and step.name in c:
                    nxt.append(c[step.name])
        elif isinstance(step, FieldUnion):
            for c in current:
                if isinstance(c, dict):
                    for n in step.names:
                        if n in c:
                            nxt.append(c[n])
        elif isinstance(step, Index):
            for c in current:
                if isinstance(c, list):
                    k = step.index
                    if -len(c) <= k < len(c):
                        nxt.append(c[k])
        elif isinstance(step, IndexUnion):
            for c in current:
                if isinstance(c, list):
                    for k in step.indexes:
                        if -len(c) <= k < len(c):
                            nxt.append(c[k])
        elif isinstance(step, Slice):
            for c in current:
                if isinstance(c, list):
                    nxt.extend(c[step.start : step.stop : step.step])
        elif isinstance(step, Wildcard):
            for c in current:
                if isinstance(c, list):
                    nxt.extend(c)
                elif isinstance(c, dict):
                    nxt.extend(c.values())
        elif isinstance(step, RecursiveField):
            for c in current:
                all_nodes: List[Any] = []
                _walk(c, all_nodes)
                for n in all_nodes:
                    if isinstance(n, dict) and step.name in n:
                        nxt.append(n[step.name])
        elif isinstance(step, RecursiveAll):
            for c in current:
                sub: List[Any] = []
                _walk(c, sub)
                # Jayway's '$..*' yields descendants only — the current
                # node itself is excluded
                nxt.extend(sub[1:])
        elif isinstance(step, Filter):
            for c in current:
                if isinstance(c, list):
                    for el in c:
                        if _eval_filter(step.expr, el, root):
                            nxt.append(el)
                elif isinstance(c, dict):
                    # Jayway applies object filters to the object itself
                    if _eval_filter(step.expr, c, root):
                        nxt.append(c)
        else:  # pragma: no cover
            raise JsonPathSyntaxError(f"unknown step {step!r}")
        current = nxt
        if not current:
            return []
    return current


def _eval_operand(expr: Expr, el: Any, root: Any) -> Any:
    if isinstance(expr, Literal):
        return expr.value
    if isinstance(expr, SubPath):
        base = root if expr.root else el
        if all(isinstance(s, (Field, Index)) for s in expr.steps):
            return _read_definite(expr.steps, base)
        matches = _eval_steps(expr.steps, [base], root)
        return matches if matches else _MISSING
    raise JsonPathSyntaxError(f"bad operand {expr!r}")


def _eval_filter(expr: Expr, el: Any, root: Any) -> bool:
    if isinstance(expr, BoolOp):
        if expr.op == "and":
            return all(_eval_filter(o, el, root) for o in expr.operands)
        return any(_eval_filter(o, el, root) for o in expr.operands)
    if isinstance(expr, Not):
        return not _eval_filter(expr.operand, el, root)
    if isinstance(expr, BinOp):
        lv = _eval_operand(expr.left, el, root)
        if expr.op == "=~":
            if lv is _MISSING or not isinstance(lv, str):
                return False
            assert isinstance(expr.right, Regex)
            # Jayway RegexpEvaluator uses Matcher.matches() (full match)
            return re.fullmatch(expr.right.pattern, lv, expr.right.flags) is not None
        rv = _eval_operand(expr.right, el, root)
        if expr.op == "size":
            # Jayway SizeEvaluator: string length or array size equals rv
            if isinstance(lv, (str, list)) and _is_number(rv):
                return len(lv) == int(rv)
            return False
        if expr.op == "empty":
            # Jayway EmptyEvaluator: left must be a string or collection
            if isinstance(lv, (str, list, dict)) and isinstance(rv, bool):
                return (len(lv) == 0) == rv
            return False
        if expr.op in ("in", "nin"):
            if rv is _MISSING or lv is _MISSING or not isinstance(rv, list):
                return expr.op == "nin"
            return (lv in rv) if expr.op == "in" else (lv not in rv)
        if lv is _MISSING or rv is _MISSING:
            # Jayway: comparisons against an absent path never match,
            # except != which is vacuously true
            return expr.op == "!="
        return _compare(expr.op, lv, rv)
    if isinstance(expr, SubPath):  # existence test, e.g. [?(@.isbn)]
        return _eval_operand(expr, el, root) is not _MISSING
    if isinstance(expr, Literal):
        return bool(expr.value)
    raise JsonPathSyntaxError(f"bad filter expr {expr!r}")


def _resolve_fn_args(
    args: Tuple[Tuple[str, Any], ...], root: Any
) -> List[Any]:
    """Jayway Parameter values: literals pass through; $-rooted paths
    evaluate against the DOCUMENT ROOT with the same read semantics as a
    standalone path (definite -> value-or-None, indefinite -> match list)."""
    out: List[Any] = []
    for kind, v in args:
        if kind == "lit":
            out.append(v)
        else:
            if all(isinstance(s, (Field, Index)) for s in v):
                got = _read_definite(v, root)
                out.append(None if got is _MISSING else got)
            else:
                out.append(_eval_steps(v, [root], root))
    return out


def _java_to_string(v: Any) -> str:
    """Parameter-to-String conversion (Jayway Parameter.toList(String, ..)
    falls back to Object.toString()): Java spellings for bool; numbers as
    Java prints them; containers as compact JSON."""
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # Java Double.toString keeps the .0 on integral doubles, as does
        # Python's str()
        return str(v)
    if isinstance(v, (list, dict)):
        import json

        return json.dumps(v, separators=(",", ":"))
    return str(v)


def _apply_tail_fn(
    name: str,
    model: Any,
    args: Tuple[Tuple[str, Any], ...] = (),
    root: Any = None,
) -> Any:
    """Jayway 2.4.0 path-function semantics, exceptions suppressed to None
    (the reference sets SUPPRESS_EXCEPTIONS; a type mismatch that would
    throw JsonPathException in Jayway reads as null here)."""
    if name == "concat":
        # text.Concat: string items of an array model concatenate first
        # (non-strings are skipped), then every parameter appends via
        # toString(). A null parameter NPEs in Jayway -> suppressed null.
        vals = _resolve_fn_args(args, root)
        if any(v is None for v in vals):
            return None
        buf: List[str] = []
        if isinstance(model, list):
            buf.extend(x for x in model if isinstance(x, str))
        buf.extend(_java_to_string(v) for v in vals)
        return "".join(buf)
    if name == "append":
        # json.Append: parameters are appended to an ARRAY model in order;
        # any other model passes through unchanged
        if isinstance(model, list):
            return model + _resolve_fn_args(args, root)
        return model
    if name == "length":
        # LengthFunction: array size, string length, or object entry count
        if isinstance(model, (list, str, dict)):
            return len(model)
        return None
    if name == "keys":
        # KeysFunction: property names of an object
        if isinstance(model, dict):
            return list(model.keys())
        return None
    # numeric aggregations (Jayway: only numbers participate; an empty
    # aggregation set throws -> suppressed to None); results are Double
    if not isinstance(model, list):
        return None
    nums = [float(x) for x in model if _is_number(x)]
    if not nums:
        return None
    if name == "min":
        return min(nums)
    if name == "max":
        return max(nums)
    if name == "sum":
        return sum(nums)
    if name == "avg":
        return sum(nums) / len(nums)
    if name == "stddev":
        mean = sum(nums) / len(nums)
        return (sum((x - mean) ** 2 for x in nums) / len(nums)) ** 0.5
    raise JsonPathSyntaxError(f"unknown function {name}")  # pragma: no cover


def compile_path(path: str) -> JsonPath:
    return JsonPath(path)
