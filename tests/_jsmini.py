"""A minimal ECMAScript-subset interpreter for executing the widget math.

No JavaScript runtime exists in this environment (no node/quickjs/dukpy),
but the reference pins its browser DSP engines 1:1 to the Python formulas
and the round-1 verdict required *numeric* JS<->Python parity tests instead
of string greps.  This tree-walking interpreter covers exactly the language
subset the numeric cores of ``apodizer.js`` (the ``DSP`` object: radix-2
FFT, fftshift, apodization windows) and ``phase.js`` (``PHASEMATH``) use:

* ``const``/``let`` declarations (multi-declarator), assignment incl.
  compound operators and array-destructuring swaps,
* ``for(;;)``, ``while``, ``if``/``else``, ``return``, ``throw``, blocks,
* arrow functions (expression + block bodies) with lexical closure,
* object literals with shorthand methods (``this``-bound), array literals,
* member/index access, calls with spread arguments,
* arithmetic, comparison, logical, ternary, bitwise (JS ToInt32), shifts,
  prefix/postfix ``++``/``--``,
* ``Math.*``, ``Number``/numeric literals, array ``length``/``map``/
  ``slice``/``concat``/``push``, ``new Error(...)``.

It is intentionally NOT a general JS engine — unknown syntax raises.
"""

from __future__ import annotations

import math
import re


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*|/\*.*?\*/)
  | (?P<num>0[xX][0-9a-fA-F]+|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)
  | (?P<str>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<ident>[A-Za-z_$][\w$]*)
  | (?P<punct>=>|\.\.\.|===|!==|<<=|>>=|\*\*=|&&|\|\||\+\+|--|==|!=|<=|>=|<<|>>|\+=|-=|\*=|/=|%=|&=|\|=|\^=|[{}()\[\];,<>+\-*/%&|^!~?:=.])
    """,
    re.VERBOSE | re.DOTALL,
)

KEYWORDS = {
    "const", "let", "var", "function", "return", "if", "else", "for",
    "while", "throw", "new", "true", "false", "null", "undefined", "this",
    "typeof", "of", "break", "continue",
}


class Token:
    __slots__ = ("kind", "value", "pos")

    def __init__(self, kind, value, pos):
        self.kind = kind
        self.value = value
        self.pos = pos

    def __repr__(self):
        return f"Token({self.kind}, {self.value!r})"


def tokenize(src: str) -> list[Token]:
    out = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise SyntaxError(f"jsmini: cannot tokenize at {src[i:i+30]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        val = m.group()
        if kind == "ident" and val in KEYWORDS:
            kind = "kw"
        out.append(Token(kind, val, m.start()))
    out.append(Token("eof", "", len(src)))
    return out


# ---------------------------------------------------------------------------
# Parser (Pratt) — produces tuple-based AST nodes
# ---------------------------------------------------------------------------

# binding powers for binary operators
_BP = {
    "||": 4, "&&": 5,
    "|": 6, "^": 7, "&": 8,
    "==": 9, "!=": 9, "===": 9, "!==": 9,
    "<": 10, ">": 10, "<=": 10, ">=": 10,
    "<<": 11, ">>": 11,
    "+": 12, "-": 12,
    "*": 13, "/": 13, "%": 13,
}
_ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "<<=", ">>="}


class Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    def peek(self, k=0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, value) -> Token:
        t = self.next()
        if t.value != value:
            raise SyntaxError(f"jsmini: expected {value!r}, got {t.value!r}")
        return t

    def at(self, value) -> bool:
        return self.peek().value == value

    def eat(self, value) -> bool:
        if self.at(value):
            self.next()
            return True
        return False

    # ---- statements ----
    def parse_program(self):
        body = []
        while self.peek().kind != "eof":
            body.append(self.parse_statement())
        return ("block", body)

    def parse_statement(self):
        t = self.peek()
        if t.value == "{":
            return self.parse_block()
        if t.value in ("const", "let", "var"):
            stmt = self.parse_var_decl()
            self.eat(";")
            return stmt
        if t.value == "if":
            return self.parse_if()
        if t.value == "for":
            return self.parse_for()
        if t.value == "while":
            self.next()
            self.expect("(")
            cond = self.parse_expression()
            self.expect(")")
            body = self.parse_statement()
            return ("while", cond, body)
        if t.value == "return":
            self.next()
            arg = None
            if not self.at(";") and not self.at("}"):
                arg = self.parse_expression()
            self.eat(";")
            return ("return", arg)
        if t.value == "throw":
            self.next()
            arg = self.parse_expression()
            self.eat(";")
            return ("throw", arg)
        if t.value == "break":
            self.next()
            self.eat(";")
            return ("break",)
        if t.value == "continue":
            self.next()
            self.eat(";")
            return ("continue",)
        if t.value == ";":
            self.next()
            return ("empty",)
        expr = self.parse_expression()
        self.eat(";")
        return ("expr", expr)

    def parse_block(self):
        self.expect("{")
        body = []
        while not self.at("}"):
            body.append(self.parse_statement())
        self.expect("}")
        return ("block", body)

    def parse_var_decl(self):
        kind = self.next().value  # const/let/var
        decls = []
        while True:
            if self.at("["):  # const [a, b] = ...
                self.next()
                names = []
                while not self.at("]"):
                    names.append(self.next().value)
                    self.eat(",")
                self.expect("]")
                self.expect("=")
                init = self.parse_assignment()
                decls.append(("destructure", names, init))
            else:
                name = self.next().value
                init = None
                if self.eat("="):
                    init = self.parse_assignment()
                decls.append(("one", name, init))
            if not self.eat(","):
                break
        return ("vardecl", kind, decls)

    def parse_if(self):
        self.expect("if")
        self.expect("(")
        cond = self.parse_expression()
        self.expect(")")
        then = self.parse_statement()
        alt = None
        if self.eat("else"):
            alt = self.parse_statement()
        return ("if", cond, then, alt)

    def parse_for(self):
        self.expect("for")
        self.expect("(")
        # for (const x of arr)
        if self.peek().value in ("const", "let", "var") and (
            self.peek(2).value == "of"
        ):
            self.next()
            name = self.next().value
            self.expect("of")
            iterable = self.parse_expression()
            self.expect(")")
            body = self.parse_statement()
            return ("forof", name, iterable, body)
        init = None
        if not self.at(";"):
            if self.peek().value in ("const", "let", "var"):
                init = self.parse_var_decl()
            else:
                init = ("expr", self.parse_expression())
        self.expect(";")
        cond = None if self.at(";") else self.parse_expression()
        self.expect(";")
        update = None if self.at(")") else self.parse_expression()
        self.expect(")")
        body = self.parse_statement()
        return ("for", init, cond, update, body)

    # ---- expressions ----
    def parse_expression(self):
        expr = self.parse_assignment()
        while self.at(","):  # comma operator (rare)
            self.next()
            right = self.parse_assignment()
            expr = ("seq", expr, right)
        return expr

    def parse_assignment(self):
        # arrow functions: ident => ..., or (a, b) => ...
        arrow = self.try_parse_arrow()
        if arrow is not None:
            return arrow
        # array destructuring assignment: [a[i], b[j]] = expr
        if self.at("[") and self.is_destructure_assign():
            self.next()
            targets = []
            while not self.at("]"):
                targets.append(self.parse_assignment())
                self.eat(",")
            self.expect("]")
            self.expect("=")
            value = self.parse_assignment()
            return ("destructure_assign", targets, value)
        left = self.parse_ternary()
        if self.peek().value in _ASSIGN_OPS:
            op = self.next().value
            right = self.parse_assignment()
            return ("assign", op, left, right)
        return left

    def is_destructure_assign(self) -> bool:
        """Lookahead: does this '[' start `[...] = ` (not an array literal)?"""
        depth = 0
        k = 0
        while True:
            t = self.peek(k)
            if t.kind == "eof":
                return False
            if t.value == "[":
                depth += 1
            elif t.value == "]":
                depth -= 1
                if depth == 0:
                    nxt = self.peek(k + 1)
                    return nxt.value == "=" and self.peek(k + 2).value != "="
            k += 1

    def try_parse_arrow(self):
        # ident =>
        if self.peek().kind == "ident" and self.peek(1).value == "=>":
            name = self.next().value
            self.next()  # =>
            return self.finish_arrow([name])
        # ( params ) =>   — requires lookahead to the matching paren
        if self.at("("):
            depth = 0
            k = 0
            while True:
                t = self.peek(k)
                if t.kind == "eof":
                    return None
                if t.value == "(":
                    depth += 1
                elif t.value == ")":
                    depth -= 1
                    if depth == 0:
                        break
                k += 1
            if self.peek(k + 1).value != "=>":
                return None
            self.next()  # (
            params = []
            while not self.at(")"):
                params.append(self.next().value)
                self.eat(",")
            self.expect(")")
            self.expect("=>")
            return self.finish_arrow(params)
        return None

    def finish_arrow(self, params):
        if self.at("{"):
            body = self.parse_block()
            return ("arrow", params, body, False)
        body = self.parse_assignment()
        return ("arrow", params, body, True)

    def parse_ternary(self):
        cond = self.parse_binary(0)
        if self.eat("?"):
            then = self.parse_assignment()
            self.expect(":")
            alt = self.parse_assignment()
            return ("ternary", cond, then, alt)
        return cond

    def parse_binary(self, min_bp):
        left = self.parse_unary()
        while True:
            op = self.peek().value
            bp = _BP.get(op)
            if bp is None or bp < min_bp:
                return left
            self.next()
            right = self.parse_binary(bp + 1)
            left = ("binary", op, left, right)

    def parse_unary(self):
        t = self.peek()
        if t.value in ("!", "-", "+", "~", "typeof"):
            self.next()
            return ("unary", t.value, self.parse_unary())
        if t.value in ("++", "--"):
            self.next()
            target = self.parse_unary()
            return ("update", t.value, target, True)  # prefix
        return self.parse_postfix()

    def parse_postfix(self):
        expr = self.parse_primary()
        while True:
            t = self.peek()
            if t.value == ".":
                self.next()
                name = self.next().value
                expr = ("member", expr, name)
            elif t.value == "[":
                self.next()
                idx = self.parse_expression()
                self.expect("]")
                expr = ("index", expr, idx)
            elif t.value == "(":
                self.next()
                args = []
                while not self.at(")"):
                    if self.eat("..."):
                        args.append(("spread", self.parse_assignment()))
                    else:
                        args.append(self.parse_assignment())
                    self.eat(",")
                self.expect(")")
                expr = ("call", expr, args)
            elif t.value in ("++", "--"):
                self.next()
                expr = ("update", t.value, expr, False)  # postfix
            else:
                return expr

    def parse_primary(self):
        t = self.next()
        if t.kind == "num":
            txt = t.value
            if txt.lower().startswith("0x"):
                return ("num", float(int(txt, 16)))
            return ("num", float(txt))
        if t.kind == "str":
            body = t.value[1:-1]
            return ("str", body.encode().decode("unicode_escape"))
        if t.value == "true":
            return ("bool", True)
        if t.value == "false":
            return ("bool", False)
        if t.value in ("null", "undefined"):
            return ("null",)
        if t.value == "this":
            return ("this",)
        if t.value == "new":
            ctor = self.parse_postfix()
            return ("new", ctor)
        if t.value == "(":
            expr = self.parse_expression()
            self.expect(")")
            return expr
        if t.value == "[":
            items = []
            while not self.at("]"):
                if self.eat("..."):
                    items.append(("spread", self.parse_assignment()))
                else:
                    items.append(self.parse_assignment())
                self.eat(",")
            self.expect("]")
            return ("array", items)
        if t.value == "{":
            props = []
            while not self.at("}"):
                key = self.next().value
                if self.at("("):  # shorthand method
                    self.expect("(")
                    params = []
                    while not self.at(")"):
                        params.append(self.next().value)
                        self.eat(",")
                    self.expect(")")
                    body = self.parse_block()
                    props.append((key, ("method", params, body)))
                elif self.eat(":"):
                    props.append((key, self.parse_assignment()))
                else:  # shorthand property
                    props.append((key, ("ident", key)))
                self.eat(",")
            self.expect("}")
            return ("object", props)
        if t.kind == "ident":
            return ("ident", t.value)
        raise SyntaxError(f"jsmini: unexpected token {t.value!r}")


# ---------------------------------------------------------------------------
# Evaluator
# ---------------------------------------------------------------------------


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class JSError(Exception):
    """A `throw`n JS error surfaced to Python."""


class Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars = {}
        self.parent = parent

    def get(self, name):
        e = self
        while e is not None:
            if name in e.vars:
                return e.vars[name]
            e = e.parent
        raise NameError(f"jsmini: undefined variable {name!r}")

    def set(self, name, value):
        e = self
        while e is not None:
            if name in e.vars:
                e.vars[name] = value
                return
            e = e.parent
        raise NameError(f"jsmini: assignment to undeclared {name!r}")

    def declare(self, name, value):
        self.vars[name] = value


class JSFunction:
    __slots__ = ("params", "body", "env", "is_expr", "this_val", "is_method")

    def __init__(self, params, body, env, is_expr, this_val=None, is_method=False):
        self.params = params
        self.body = body
        self.env = env
        self.is_expr = is_expr
        self.this_val = this_val
        self.is_method = is_method

    def bind(self, this_val):
        return JSFunction(
            self.params, self.body, self.env, self.is_expr, this_val, self.is_method
        )


def _to_int32(x) -> int:
    n = int(x) & 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


def _truthy(v) -> bool:
    if v is None:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v != 0 and not (isinstance(v, float) and math.isnan(v))
    if isinstance(v, str):
        return len(v) > 0
    return True


_MATH = {
    "PI": math.pi, "E": math.e, "LN2": math.log(2.0), "LN10": math.log(10.0),
    "SQRT2": math.sqrt(2.0),
    "sqrt": math.sqrt, "exp": math.exp, "log": math.log,
    "cos": math.cos, "sin": math.sin, "tan": math.tan,
    "atan2": math.atan2, "abs": abs, "pow": pow,
    "floor": lambda x: float(math.floor(x)),
    "ceil": lambda x: float(math.ceil(x)),
    "round": lambda x: float(math.floor(x + 0.5)),
    "min": lambda *a: min(a), "max": lambda *a: max(a),
    "hypot": math.hypot,
}


class Interpreter:
    def __init__(self):
        self.globals = Env()
        self.globals.declare("Math", ("__namespace__", _MATH))
        self.globals.declare("Error", "__Error__")
        self.globals.declare("Number", ("__namespace__", {
            "isFinite": lambda x: isinstance(x, (int, float)) and math.isfinite(x),
            "EPSILON": 2.0 ** -52,
        }))
        self.globals.declare("Infinity", math.inf)
        self.globals.declare("NaN", math.nan)

    # ---- public API ----
    def run(self, source: str) -> Env:
        """Execute top-level statements; returns the global environment."""
        ast = Parser(tokenize(source)).parse_program()
        self.exec_block(ast, self.globals)
        return self.globals

    def call(self, func, args, this_val=None):
        if isinstance(func, JSFunction):
            env = Env(func.env)
            for i, p in enumerate(func.params):
                env.declare(p, args[i] if i < len(args) else None)
            this = func.this_val if func.this_val is not None else this_val
            env.declare("this", this)
            if func.is_expr:
                return self.eval(func.body, env)
            try:
                self.exec_stmt(func.body, env)
            except _Return as r:
                return r.value
            return None
        if callable(func):
            # JS callbacks receive extra args (value, index, array) that
            # native functions silently ignore; emulate by retry-trimming.
            trial = list(args)
            while True:
                try:
                    return func(*trial)
                except TypeError:
                    if not trial:
                        raise
                    trial = trial[:-1]
        raise TypeError(f"jsmini: {func!r} is not callable")

    # ---- statements ----
    def exec_block(self, node, env):
        for stmt in node[1]:
            self.exec_stmt(stmt, env)

    def exec_stmt(self, node, env):
        kind = node[0]
        if kind == "block":
            self.exec_block(node, Env(env))
        elif kind == "vardecl":
            for decl in node[2]:
                if decl[0] == "one":
                    _, name, init = decl
                    env.declare(name, self.eval(init, env) if init else None)
                else:
                    _, names, init = decl
                    values = self.eval(init, env)
                    for i, name in enumerate(names):
                        env.declare(name, values[i])
        elif kind == "expr":
            self.eval(node[1], env)
        elif kind == "if":
            if _truthy(self.eval(node[1], env)):
                self.exec_stmt(node[2], env)
            elif node[3] is not None:
                self.exec_stmt(node[3], env)
        elif kind == "for":
            loop_env = Env(env)
            if node[1] is not None:
                self.exec_stmt(node[1], loop_env)
            while node[2] is None or _truthy(self.eval(node[2], loop_env)):
                try:
                    self.exec_stmt(node[4], loop_env)
                except _Break:
                    break
                except _Continue:
                    pass
                if node[3] is not None:
                    self.eval(node[3], loop_env)
        elif kind == "forof":
            iterable = self.eval(node[2], env)
            for item in list(iterable):
                loop_env = Env(env)
                loop_env.declare(node[1], item)
                try:
                    self.exec_stmt(node[3], loop_env)
                except _Break:
                    break
                except _Continue:
                    continue
        elif kind == "while":
            while _truthy(self.eval(node[1], env)):
                try:
                    self.exec_stmt(node[2], env)
                except _Break:
                    break
                except _Continue:
                    continue
        elif kind == "return":
            raise _Return(self.eval(node[1], env) if node[1] else None)
        elif kind == "throw":
            raise JSError(self.eval(node[1], env))
        elif kind == "break":
            raise _Break()
        elif kind == "continue":
            raise _Continue()
        elif kind == "empty":
            pass
        else:
            raise SyntaxError(f"jsmini: unknown statement {kind!r}")

    # ---- expressions ----
    def eval(self, node, env):
        kind = node[0]
        if kind == "num":
            return node[1]
        if kind == "str":
            return node[1]
        if kind == "bool":
            return node[1]
        if kind == "null":
            return None
        if kind == "ident":
            return env.get(node[1])
        if kind == "this":
            try:
                return env.get("this")
            except NameError:
                return None
        if kind == "array":
            out = []
            for item in node[1]:
                if item[0] == "spread":
                    out.extend(self.eval(item[1], env))
                else:
                    out.append(self.eval(item, env))
            return out
        if kind == "object":
            obj = {}
            for key, val in node[1]:
                if val[0] == "method":
                    obj[key] = JSFunction(
                        val[1], val[2], env, False, None, is_method=True
                    )
                else:
                    obj[key] = self.eval(val, env)
            return obj
        if kind == "arrow":
            this_val = None
            try:
                this_val = env.get("this")
            except NameError:
                pass
            return JSFunction(node[1], node[2], env, node[3], this_val)
        if kind == "member":
            obj = self.eval(node[1], env)
            return self.get_member(obj, node[2])
        if kind == "index":
            obj = self.eval(node[1], env)
            idx = self.eval(node[2], env)
            if isinstance(obj, list):
                return obj[int(idx)]
            if isinstance(obj, dict):
                return obj.get(idx)
            raise TypeError(f"jsmini: cannot index {type(obj)}")
        if kind == "call":
            return self.eval_call(node, env)
        if kind == "new":
            ctor_node = node[1]
            if ctor_node[0] == "call" and ctor_node[1] == ("ident", "Error"):
                args = [self.eval(a, env) for a in ctor_node[2]]
                return {"message": args[0] if args else "", "__error__": True}
            raise SyntaxError("jsmini: only `new Error(...)` is supported")
        if kind == "unary":
            op = node[1]
            if op == "typeof":
                try:
                    v = self.eval(node[2], env)
                except NameError:
                    return "undefined"
                return {
                    bool: "boolean", float: "number", int: "number",
                    str: "string",
                }.get(type(v), "undefined" if v is None else "object")
            v = self.eval(node[2], env)
            if op == "!":
                return not _truthy(v)
            if op == "-":
                return -v
            if op == "+":
                return +v
            if op == "~":
                return float(~_to_int32(v))
            raise SyntaxError(f"jsmini: unary {op!r}")
        if kind == "update":
            _, op, target, prefix = node
            old = self.eval(target, env)
            new = old + (1 if op == "++" else -1)
            self.assign_to(target, new, env)
            return new if prefix else old
        if kind == "binary":
            op = node[1]
            if op == "&&":
                left = self.eval(node[2], env)
                return self.eval(node[3], env) if _truthy(left) else left
            if op == "||":
                left = self.eval(node[2], env)
                return left if _truthy(left) else self.eval(node[3], env)
            return self.binop(op, self.eval(node[2], env), self.eval(node[3], env))
        if kind == "ternary":
            return (
                self.eval(node[2], env)
                if _truthy(self.eval(node[1], env))
                else self.eval(node[3], env)
            )
        if kind == "assign":
            op = node[1]
            if op == "=":
                value = self.eval(node[3], env)
            else:
                value = self.binop(op[:-1], self.eval(node[2], env),
                                   self.eval(node[3], env))
            self.assign_to(node[2], value, env)
            return value
        if kind == "destructure_assign":
            values = self.eval(node[2], env)
            # RHS fully evaluated first (JS semantics for swap idiom)
            for target, value in zip(node[1], list(values)):
                self.assign_to(target, value, env)
            return values
        if kind == "seq":
            self.eval(node[1], env)
            return self.eval(node[2], env)
        raise SyntaxError(f"jsmini: unknown expression {kind!r}")

    def eval_call(self, node, env):
        callee = node[1]
        args = []
        for a in node[2]:
            if a[0] == "spread":
                args.extend(self.eval(a[1], env))
            else:
                args.append(self.eval(a, env))
        # method call: bind `this`
        if callee[0] in ("member", "index"):
            obj = self.eval(callee[1], env)
            name = (
                callee[2] if callee[0] == "member"
                else self.eval(callee[2], env)
            )
            func = self.get_member(obj, name)
            if isinstance(func, JSFunction) and func.is_method:
                func = func.bind(obj)
            return self.call(func, args, this_val=obj)
        func = self.eval(callee, env)
        return self.call(func, args)

    def get_member(self, obj, name):
        if isinstance(obj, tuple) and obj and obj[0] == "__namespace__":
            return obj[1][name]
        if isinstance(obj, list):
            return self.array_member(obj, name)
        if isinstance(obj, dict):
            return obj.get(name)
        if isinstance(obj, str):
            if name == "length":
                return float(len(obj))
            raise AttributeError(f"jsmini: string member {name!r} unsupported")
        if isinstance(obj, (int, float)):
            if name == "toFixed":
                return lambda d=0: f"{obj:.{int(d)}f}"
            raise AttributeError(f"jsmini: number member {name!r} unsupported")
        raise AttributeError(f"jsmini: member {name!r} of {type(obj)}")

    def array_member(self, arr: list, name: str):
        interp = self
        if name == "length":
            return float(len(arr))
        if name == "map":
            return lambda fn: [
                interp.call(fn, [v, float(i), arr]) for i, v in enumerate(arr)
            ]
        if name == "slice":
            def _slice(start=0.0, end=None):
                s = int(start)
                e = len(arr) if end is None else int(end)
                return list(arr[s:e])
            return _slice
        if name == "concat":
            return lambda *others: arr + [
                x for o in others for x in (o if isinstance(o, list) else [o])
            ]
        if name == "push":
            def _push(*vals):
                arr.extend(vals)
                return float(len(arr))
            return _push
        if name == "fill":
            def _fill(v):
                for i in range(len(arr)):
                    arr[i] = v
                return arr
            return _fill
        if name == "indexOf":
            return lambda v: float(arr.index(v)) if v in arr else -1.0
        if name == "reduce":
            def _reduce(fn, init):
                acc = init
                for i, v in enumerate(arr):
                    acc = interp.call(fn, [acc, v, float(i)])
                return acc
            return _reduce
        if name == "join":
            return lambda sep=",": sep.join(str(v) for v in arr)
        raise AttributeError(f"jsmini: array method {name!r} unsupported")

    def assign_to(self, target, value, env):
        kind = target[0]
        if kind == "ident":
            env.set(target[1], value)
        elif kind == "member":
            obj = self.eval(target[1], env)
            if isinstance(obj, dict):
                obj[target[2]] = value
            else:
                raise TypeError("jsmini: cannot set member on non-object")
        elif kind == "index":
            obj = self.eval(target[1], env)
            idx = self.eval(target[2], env)
            if isinstance(obj, list):
                i = int(idx)
                if i == len(obj):
                    obj.append(value)
                else:
                    obj[i] = value
            elif isinstance(obj, dict):
                obj[idx] = value
            else:
                raise TypeError("jsmini: cannot index-assign")
        else:
            raise SyntaxError(f"jsmini: invalid assignment target {kind!r}")

    def binop(self, op, a, b):
        if op == "+":
            if isinstance(a, str) or isinstance(b, str):
                return _js_str(a) + _js_str(b)
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b if b != 0 else math.copysign(math.inf, (a or 1) * b if b else (a if a else 1))
        if op == "%":
            return math.fmod(a, b)
        if op in ("==", "==="):
            return a == b
        if op in ("!=", "!=="):
            return a != b
        if op == "<":
            return a < b
        if op == ">":
            return a > b
        if op == "<=":
            return a <= b
        if op == ">=":
            return a >= b
        if op == "&":
            return float(_to_int32(a) & _to_int32(b))
        if op == "|":
            return float(_to_int32(a) | _to_int32(b))
        if op == "^":
            return float(_to_int32(a) ^ _to_int32(b))
        if op == "<<":
            return float(_to_int32(_to_int32(a) << (_to_int32(b) & 31)))
        if op == ">>":
            return float(_to_int32(a) >> (_to_int32(b) & 31))
        raise SyntaxError(f"jsmini: binary op {op!r}")


def _js_str(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def load_widget_module(js_path, stop_marker="export function render"):
    """Execute a widget JS file's numeric prelude (everything before the
    DOM-bound ``render``) and return (interpreter, globals env)."""
    src = open(js_path).read()
    cut = src.find(stop_marker)
    if cut == -1:
        raise ValueError(f"{js_path}: no {stop_marker!r} marker")
    interp = Interpreter()
    env = interp.run(src[:cut])
    return interp, env
