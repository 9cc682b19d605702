"""Sandboxed compilation of LLM-synthesized function source.

The reference ``exec()``s generated code with full builtins, once PER
ROW (fast_ai_wrangler/function_generator.py:119-135, the exec at :131
inside the row loop at :142-149). Here the source is

1. statically validated on the driver (AST walk: import allowlist
   mirroring the prompt whitelist at promptsTemplate.py:10,38,75, no
   dunder access, no exec/eval/open/__import__), then
2. compiled ONCE per Python worker process into a restricted
   namespace, memoized by source hash (see apply.py).

This is defense-in-depth for *accidental* damage (file/network access,
runaway imports), not a security boundary against a malicious model —
that caveat is documented at the API surface.
"""

from __future__ import annotations

import ast
import builtins
from collections.abc import Callable

#: Import allowlist — the library surface the reference prompts permit
#: the generated functions to use (promptsTemplate.py:10 base list,
#: :38 matching extras, :75 error-detection extras), plus stdlib
#: modules those libraries pull in implicitly.
ALLOWED_IMPORTS: frozenset[str] = frozenset(
    {
        # promptsTemplate.py:10
        "re", "fractions", "math", "pyproj", "bs4", "BeautifulSoup",
        "geopy", "ummalqura", "mgrs", "pytz", "datetime", "calendar",
        "roman",
        # promptsTemplate.py:38
        "numpy", "sklearn", "Levenshtein",
        # promptsTemplate.py:75
        "spellchecker", "nltk",
        # benign stdlib commonly emitted by code models
        "string", "itertools", "functools", "collections", "unicodedata",
        "decimal", "json", "time",
    }
)

#: Stdlib support modules that allowlisted libraries import lazily at
#: call time through the caller's ``__import__`` (e.g. datetime.strptime
#: → _strptime). Permitted at runtime only — generated source cannot
#: name them explicitly (static pass checks ALLOWED_IMPORTS alone).
_INTERNAL_IMPORTS: frozenset[str] = frozenset(
    {"_strptime", "locale", "_locale", "copyreg", "encodings", "codecs"}
)

#: Builtins exposed inside the sandbox namespace.
SAFE_BUILTINS: frozenset[str] = frozenset(
    {
        "abs", "all", "any", "ascii", "bin", "bool", "bytearray", "bytes",
        "callable", "chr", "complex", "dict", "divmod", "enumerate",
        "filter", "float", "format", "frozenset", "hash", "hex", "id",
        "int", "isinstance", "issubclass", "iter", "len", "list", "map",
        "max", "min", "next", "object", "oct", "ord", "pow", "print",
        "range", "repr", "reversed", "round", "set", "slice", "sorted",
        "str", "sum", "tuple", "type", "zip",
        # exception types generated code routinely raises/catches
        "ArithmeticError", "AttributeError", "BaseException", "Exception",
        "IndexError", "KeyError", "LookupError", "NameError",
        "NotImplementedError", "OverflowError", "RuntimeError",
        "StopIteration", "TypeError", "ValueError", "ZeroDivisionError",
        "True", "False", "None",
    }
)

_BANNED_CALLS = frozenset({"exec", "eval", "compile", "open", "input", "__import__", "globals", "locals", "vars", "getattr", "setattr", "delattr", "breakpoint", "exit", "quit"})


class SandboxError(ValueError):
    """Generated source failed static validation."""


def validate_source(source: str) -> ast.Module:
    """Driver-side static gate: parse + walk the AST.

    Rejects disallowed imports, banned calls, and dunder attribute
    access. Returns the parsed module on success.
    """
    try:
        tree = ast.parse(source)
    except SyntaxError as exc:
        raise SandboxError(f"syntax error in generated code: {exc}") from exc
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            if isinstance(node, ast.ImportFrom) and node.level:
                raise SandboxError("relative imports not allowed")
            names = (
                [node.module.split(".")[0]] if isinstance(node, ast.ImportFrom) and node.module
                else [a.name.split(".")[0] for a in node.names]
            )
            for mod in names:
                if mod not in ALLOWED_IMPORTS:
                    raise SandboxError(f"import of {mod!r} not in allowlist")
        elif isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
            if node.func.id in _BANNED_CALLS:
                raise SandboxError(f"call to {node.func.id!r} not allowed")
        elif isinstance(node, ast.Attribute) and node.attr.startswith("__") and node.attr.endswith("__"):
            raise SandboxError(f"dunder attribute access {node.attr!r} not allowed")
        elif isinstance(node, ast.Name) and node.id in _BANNED_CALLS:
            raise SandboxError(f"reference to {node.id!r} not allowed")
    return tree


def compile_function(source: str, entry_name: str) -> Callable[[str], object]:
    """Compile validated source and return the named entry callable.

    The namespace gets restricted builtins only; imports inside the
    source go through a guarded ``__import__`` that re-checks the
    allowlist at runtime (the static pass can be fooled by aliasing,
    the runtime hook cannot).
    """
    validate_source(source)

    real_import = builtins.__import__

    def guarded_import(name, *args, **kwargs):
        root = name.split(".")[0]
        if root not in ALLOWED_IMPORTS and root not in _INTERNAL_IMPORTS:
            raise ImportError(f"import of {name!r} blocked by sandbox")
        return real_import(name, *args, **kwargs)

    safe = {k: getattr(builtins, k, None) for k in SAFE_BUILTINS if hasattr(builtins, k)}
    safe["True"], safe["False"], safe["None"] = True, False, None
    safe["__import__"] = guarded_import
    namespace: dict = {"__builtins__": safe}
    exec(compile(source, "<synthesized>", "exec"), namespace)  # noqa: S102 — sandboxed by construction
    fn = namespace.get(entry_name)
    if not callable(fn):
        raise SandboxError(f"entry point {entry_name!r} not defined by generated code")
    return fn
