"""Tokenizer + recursive-descent parser for the reference's SQL surface.

The reference parses full SQL with sqlparser-rs but *executes* only this
grammar (reference: src/planner/logical_planner.rs:263-300 consumes only
``Select{projection, from, selection}``; expression cases implemented in
src/handlers/operator_handler/operators/record_utils/compute_value.rs:57-344):

    statement   := SELECT select_list FROM source [WHERE expr]
    select_list := '*' | item (',' item)*
    item        := expr [AS ident] | expr ident
    source      := read_files('<glob>' [, connection=>'<name>']) [alias]
                 | ident [alias]
    expr        := or_expr
    or_expr     := and_expr (OR and_expr)*
    and_expr    := cmp_expr (AND cmp_expr)*
    cmp_expr    := add_expr (('='|'!='|'<>'|'>'|'>='|'<'|'<=') add_expr)?
    add_expr    := mul_expr (('+'|'-') mul_expr)*
    mul_expr    := unary (('*'|'/'|'%') unary)*
    unary       := '-' unary | primary
    primary     := number | string | TRUE | FALSE | ident('.'ident)* | '(' expr ')'

Binary-op inventory matches compute_value.rs:66-218 exactly (AND OR
+ / * % = != <> > >= < <=); ``-`` and unary minus are small extensions the
reference errors on (BinaryOperatorNotImplemented, compute_value.rs:210-216).

Everything beyond this grammar (joins, GROUP BY, functions, ...) goes
through Spark SQL directly — see engine.QueryEngine(mode="spark").
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# --------------------------------------------------------------------- AST


@dataclass
class Literal:
    value: object  # int | float | bool | str
    kind: str  # "int" | "float" | "bool" | "string"


@dataclass
class Identifier:
    parts: tuple[str, ...]  # ("col",) or ("alias", "col")


@dataclass
class BinaryOp:
    op: str
    left: object
    right: object


@dataclass
class UnaryMinus:
    operand: object


@dataclass
class SelectItem:
    expr: object | None  # None => wildcard '*'
    alias: str | None
    wildcard: bool = False
    # qualified wildcard ``t.*`` — the reference ERRORS on this
    # (record_projection.rs:33-38 "Alias not supported"); implemented
    # here instead of replicating the gap.
    qualifier: str | None = None


@dataclass
class ReadFilesSource:
    path_glob: str
    connection: str = "default"
    alias: str | None = None
    merge_schema: bool = False


@dataclass
class TableSource:
    name: str
    alias: str | None = None


@dataclass
class TableFunctionSource:
    """A registered table-function call, resolved by the engine against
    the TableFunctionRegistry (reference: operator_task_registry.rs)."""

    name: str
    args: list[str] = field(default_factory=list)
    kwargs: dict[str, str] = field(default_factory=dict)
    alias: str | None = None


@dataclass
class OrderItem:
    expr: object
    ascending: bool = True


@dataclass
class SelectStatement:
    items: list[SelectItem]
    source: object  # ReadFilesSource | TableSource | TableFunctionSource
    where: object | None = None
    # additional comma-separated FROM relations: the reference wires each
    # into the SAME downstream stage — a bag union, not a cross join
    # (logical_planner.rs:277-283 + connect_stages :149-166)
    more_sources: list = field(default_factory=list)
    # ORDER BY / LIMIT: both explicit reference TODOs ("Implement the
    # `order by` operator", README "Next work"; LIMIT absent from the
    # planner) — implemented here as grammar extensions.
    order_by: list[OrderItem] = field(default_factory=list)
    limit: int | None = None


# ------------------------------------------------------------------ tokens

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>'(?:[^']|'')*')
  | (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|\.\d+)
  | (?P<arrow>=>)
  | (?P<op><=|>=|!=|<>|[=<>+\-*/%(),.;])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "SELECT", "FROM", "WHERE", "AS", "AND", "OR", "TRUE", "FALSE", "NOT",
    "ORDER", "BY", "ASC", "DESC", "LIMIT",
}


@dataclass
class Token:
    kind: str  # "string" | "number" | "op" | "ident" | "keyword" | "arrow" | "eof"
    text: str
    pos: int


class SqlSyntaxError(ValueError):
    pass


def tokenize(sql: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if m is None:
            raise SqlSyntaxError(f"unexpected character {sql[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "ident" and text.upper() in _KEYWORDS:
            tokens.append(Token("keyword", text.upper(), m.start()))
        else:
            tokens.append(Token(kind, text, m.start()))
    tokens.append(Token("eof", "", len(sql)))
    return tokens


class _Parser:
    def __init__(self, tokens: list[Token]):
        self.tokens = tokens
        self.i = 0

    # -- cursor helpers ------------------------------------------------
    def peek(self) -> Token:
        return self.tokens[self.i]

    def next(self) -> Token:
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def accept(self, kind: str, text: str | None = None) -> Token | None:
        tok = self.peek()
        if tok.kind == kind and (text is None or tok.text == text):
            return self.next()
        return None

    def expect(self, kind: str, text: str | None = None) -> Token:
        tok = self.accept(kind, text)
        if tok is None:
            got = self.peek()
            raise SqlSyntaxError(
                f"expected {text or kind} at {got.pos}, got {got.text!r}"
            )
        return tok

    # -- expressions (precedence climbing) ------------------------------
    def expression(self):
        return self._or()

    def _or(self):
        node = self._and()
        while self.accept("keyword", "OR"):
            node = BinaryOp("OR", node, self._and())
        return node

    def _and(self):
        node = self._cmp()
        while self.accept("keyword", "AND"):
            node = BinaryOp("AND", node, self._cmp())
        return node

    def _cmp(self):
        node = self._add()
        tok = self.peek()
        if tok.kind == "op" and tok.text in ("=", "!=", "<>", ">", ">=", "<", "<="):
            self.next()
            op = "!=" if tok.text == "<>" else tok.text
            node = BinaryOp(op, node, self._add())
        return node

    def _add(self):
        node = self._mul()
        while True:
            tok = self.peek()
            if tok.kind == "op" and tok.text in ("+", "-"):
                self.next()
                node = BinaryOp(tok.text, node, self._mul())
            else:
                return node

    def _mul(self):
        node = self._unary()
        while True:
            tok = self.peek()
            if tok.kind == "op" and tok.text in ("*", "/", "%"):
                self.next()
                node = BinaryOp(tok.text, node, self._unary())
            else:
                return node

    def _unary(self):
        if self.accept("op", "-"):
            return UnaryMinus(self._unary())
        return self._primary()

    def _primary(self):
        tok = self.peek()
        if tok.kind == "number":
            self.next()
            # literal typing mirrors compute_value.rs:220-250: integer
            # literals → Int32 if they fit else Int64; decimal-pointed /
            # exponent literals → float.
            if re.fullmatch(r"\d+", tok.text):
                return Literal(int(tok.text), "int")
            return Literal(float(tok.text), "float")
        if tok.kind == "string":
            self.next()
            return Literal(tok.text[1:-1].replace("''", "'"), "string")
        if tok.kind == "keyword" and tok.text in ("TRUE", "FALSE"):
            self.next()
            return Literal(tok.text == "TRUE", "bool")
        if tok.kind == "ident":
            parts = [self.next().text]
            while self.accept("op", "."):
                parts.append(self.expect("ident").text)
            if len(parts) > 2:
                # compute_value.rs:275-337 supports 1- and 2-part only
                raise SqlSyntaxError(
                    f"compound identifier with >2 parts at {tok.pos}: {'.'.join(parts)}"
                )
            return Identifier(tuple(parts))
        if self.accept("op", "("):
            node = self.expression()
            self.expect("op", ")")
            return node
        raise SqlSyntaxError(f"unexpected token {tok.text!r} at {tok.pos}")

    # -- statement -------------------------------------------------------
    def select_statement(self) -> SelectStatement:
        self.expect("keyword", "SELECT")
        items = self._select_list()
        self.expect("keyword", "FROM")
        source = self._source()
        more = []
        while self.accept("op", ","):
            more.append(self._source())
        where = None
        if self.accept("keyword", "WHERE"):
            where = self.expression()
        order_by: list[OrderItem] = []
        if self.accept("keyword", "ORDER"):
            self.expect("keyword", "BY")
            while True:
                expr = self.expression()
                asc = True
                if self.accept("keyword", "DESC"):
                    asc = False
                else:
                    self.accept("keyword", "ASC")
                order_by.append(OrderItem(expr, asc))
                if not self.accept("op", ","):
                    break
        limit = None
        if self.accept("keyword", "LIMIT"):
            tok = self.expect("number")
            if not re.fullmatch(r"\d+", tok.text):
                raise SqlSyntaxError(f"LIMIT expects an integer at {tok.pos}")
            limit = int(tok.text)
        self.accept("op", ";")
        self.expect("eof")
        return SelectStatement(items, source, where, more, order_by, limit)

    def _select_list(self) -> list[SelectItem]:
        items = []
        while True:
            if self.accept("op", "*"):
                items.append(SelectItem(None, None, wildcard=True))
            elif (
                self.peek().kind == "ident"
                and self.tokens[self.i + 1].kind == "op"
                and self.tokens[self.i + 1].text == "."
                and self.tokens[self.i + 2].kind == "op"
                and self.tokens[self.i + 2].text == "*"
            ):
                qual = self.next().text  # ident
                self.next()  # '.'
                self.next()  # '*'
                items.append(SelectItem(None, None, wildcard=True, qualifier=qual))
            else:
                expr = self.expression()
                alias = None
                if self.accept("keyword", "AS"):
                    alias = self.expect("ident").text
                elif self.peek().kind == "ident":
                    alias = self.next().text
                items.append(SelectItem(expr, alias))
            if not self.accept("op", ","):
                return items

    def _source(self):
        tok = self.expect("ident")
        if self.accept("op", "("):
            # generic table-function call grammar (mirrors the arg shape
            # of read_files_task.rs:64-105): positional string args,
            # then named args ``ident=>'value'``.
            args: list[str] = []
            kwargs: dict[str, str] = {}
            if not self.accept("op", ")"):
                while True:
                    if self.peek().kind == "ident":
                        name = self.expect("ident").text
                        self.expect("arrow")
                        kwargs[name.lower()] = self.expect("string").text[1:-1]
                    else:
                        args.append(
                            self.expect("string").text[1:-1].replace("''", "'")
                        )
                    if not self.accept("op", ","):
                        break
                self.expect("op", ")")
            alias = self._opt_alias()
            if tok.text.lower() == "read_files":
                # parse-time validation, reference parity
                if len(args) != 1:
                    raise SqlSyntaxError("read_files takes exactly one path glob")
                for name in kwargs:
                    if name not in ("connection", "merge_schema"):
                        raise SqlSyntaxError(f"unknown read_files argument {name!r}")
                return ReadFilesSource(
                    args[0],
                    kwargs.get("connection", "default"),
                    alias,
                    kwargs.get("merge_schema", "false").lower() == "true",
                )
            return TableFunctionSource(tok.text.lower(), args, kwargs, alias)
        name = tok.text
        alias = self._opt_alias()
        return TableSource(name, alias)

    def _opt_alias(self) -> str | None:
        if self.accept("keyword", "AS"):
            return self.expect("ident").text
        if self.peek().kind == "ident":
            return self.next().text
        return None


def split_statements(sql: str) -> list[str]:
    """Split a script into statements on ``;`` outside string literals,
    dropping ``--`` line comments.

    The reference client splits multi-statement files the same way
    (client_tui.rs:885 — regex split honoring quoted semicolons, pinned
    by test_sqlparser_behavior.rs:6-28; sqlparser tolerates the line
    comments in its sample_queries/*.sql). Empty/whitespace-only
    fragments are dropped.
    """
    parts: list[str] = []
    buf: list[str] = []
    in_string = False
    i = 0
    while i < len(sql):
        ch = sql[i]
        if ch == "'":
            in_string = not in_string  # '' escaping flips twice — parity holds
            buf.append(ch)
        elif not in_string and ch == "-" and sql[i : i + 2] == "--":
            while i < len(sql) and sql[i] != "\n":
                i += 1
            continue
        elif ch == ";" and not in_string:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def parse_expression(text: str):
    p = _Parser(tokenize(text))
    node = p.expression()
    p.expect("eof")
    return node


def parse_select(sql: str) -> SelectStatement:
    return _Parser(tokenize(sql)).select_statement()
