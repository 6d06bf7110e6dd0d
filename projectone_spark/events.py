"""Event bus: subscribe/dispatch with webhook + custom handlers.

Reference surface (``core/event/manager.py:10-112``, handlers
``core/event/__init__.py:112-152``, severities
``core/schemas/event.py:6-104``): named events carry a severity in
{CONTINUE, FAIL, STOP_WH_FAIL}; handlers are webhook notifications or
user callables. The reference consumes from a Queue on a daemon thread;
this bus dispatches on a daemon thread too but can run synchronously for
deterministic tests (``synchronous=True``).
"""

from __future__ import annotations

import json
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable

SEVERITIES = ("CONTINUE", "FAIL", "STOP_WH_FAIL")


@dataclass
class Event:
    name: str
    severity: str = "CONTINUE"
    message: str = ""
    detail: dict[str, Any] = field(default_factory=dict)
    ts: float = field(default_factory=time.time)

    def __post_init__(self) -> None:
        if self.severity not in SEVERITIES:
            raise ValueError(f"severity must be one of {SEVERITIES}")


def _auth_headers(auth: Any) -> dict[str, str]:
    """Authorization headers for a notification consumer (reference
    ``APICredentials``, ``core/schemas/event.py:29-46``): ``("basic",
    user, password)`` → HTTP basic; an ``OAuthSpec`` (the same token
    provider the OData connector uses, ``auth_type=oauth`` +
    ``auth_url``) → Bearer."""
    if auth is None:
        return {}
    if isinstance(auth, tuple) and auth and auth[0] == "basic":
        import base64

        cred = base64.b64encode(f"{auth[1]}:{auth[2]}".encode()).decode()
        return {"Authorization": f"Basic {cred}"}
    if hasattr(auth, "access_token"):  # OAuthSpec-shaped
        return {"Authorization": f"Bearer {auth.access_token()}"}
    raise ValueError(f"unsupported webhook auth {type(auth).__name__}")


def post_webhook(url: str, payload: dict[str, Any],
                 transport: Callable[..., Any] | None = None,
                 headers: dict[str, str] | None = None,
                 auth: Any = None) -> Any:
    """Webhook POST (reference ``post_webhook_api``); transport injectable
    for offline tests, default urllib. ``headers``/``auth`` mirror the
    reference's APICredentials (fixed headers + basic/oauth)."""
    body = json.dumps(payload).encode()
    hdrs = {"Content-Type": "application/json",
            **(headers or {}), **_auth_headers(auth)}
    if transport is not None:
        # Signature inspection, NOT try/except TypeError: a TypeError raised
        # INSIDE a 3-arg transport after it already sent the request would
        # otherwise trigger a duplicate POST and mask the real error.
        import inspect

        try:
            params = inspect.signature(transport).parameters.values()
            # count parameters a positional (url, body, hdrs) call can
            # actually bind — keyword-only and **kwargs params cannot take
            # a positional headers argument, so ``def t(url, body, **kw)``
            # and ``def t(url, body, *, timeout=5)`` stay 2-arg transports
            positional = [p for p in params
                          if p.kind in (p.POSITIONAL_ONLY,
                                        p.POSITIONAL_OR_KEYWORD)]
            takes_headers = (len(positional) >= 3
                             or any(p.kind == p.VAR_POSITIONAL
                                    for p in params))
        except (TypeError, ValueError):  # builtins without signatures
            takes_headers = True
        if takes_headers:
            return transport(url, body, hdrs)
        return transport(url, body)  # legacy 2-arg transports
    from urllib.request import Request, urlopen  # pragma: no cover

    req = Request(url, data=body, headers=hdrs)
    with urlopen(req, timeout=30) as resp:  # pragma: no cover
        return resp.read()


#: AST node types the condition grammar accepts. Contract-supplied strings
#: are UNTRUSTED (a pipeline YAML reaches this), so instead of eval — whose
#: "no builtins" globals are not a sandbox (attribute-chain escapes like
#: ``().__class__.__bases__...`` reach arbitrary code) — conditions are
#: parsed and interpreted over a closed expression grammar: comparisons and
#: boolean logic over the event's fields, constants, and constant-keyed
#: detail lookups. No attribute access, no calls, no comprehensions.
_ALLOWED_CMP = {
    "Eq": lambda a, b: a == b, "NotEq": lambda a, b: a != b,
    "Lt": lambda a, b: a < b, "LtE": lambda a, b: a <= b,
    "Gt": lambda a, b: a > b, "GtE": lambda a, b: a >= b,
    "In": lambda a, b: a in b, "NotIn": lambda a, b: a not in b,
}


def _eval_condition_node(node, names: dict[str, Any]):
    import ast

    if isinstance(node, ast.Expression):
        return _eval_condition_node(node.body, names)
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, (ast.Tuple, ast.List, ast.Set)):
        vals = [_eval_condition_node(e, names) for e in node.elts]
        return set(vals) if isinstance(node, ast.Set) else tuple(vals)
    if isinstance(node, ast.Name):
        if node.id not in names:
            raise ValueError(f"unknown event field '{node.id}' "
                             f"(have {sorted(names)})")
        return names[node.id]
    if isinstance(node, ast.Subscript):  # detail['key']
        container = _eval_condition_node(node.value, names)
        key = _eval_condition_node(node.slice, names)
        return container.get(key) if isinstance(container, dict) \
            else container[key]
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
        return not _eval_condition_node(node.operand, names)
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.USub,
                                                              ast.UAdd)):
        # negative/positive numeric literals ("delta > -1") — parity with
        # the eval-based conditions this grammar replaced
        val = _eval_condition_node(node.operand, names)
        return -val if isinstance(node.op, ast.USub) else +val
    if isinstance(node, ast.BoolOp):
        vals = (_eval_condition_node(v, names) for v in node.values)
        return all(vals) if isinstance(node.op, ast.And) else any(vals)
    if isinstance(node, ast.Compare):
        left = _eval_condition_node(node.left, names)
        for op, comp in zip(node.ops, node.comparators):
            fn = _ALLOWED_CMP.get(type(op).__name__)
            if fn is None:
                raise ValueError(
                    f"operator {type(op).__name__} not allowed in event "
                    f"conditions")
            right = _eval_condition_node(comp, names)
            if not fn(left, right):
                return False
            left = right
        return True
    raise ValueError(
        f"event condition may only use comparisons, and/or/not, names, "
        f"constants, and detail[...] lookups — got {type(node).__name__}")


def _validate_condition_tree(tree) -> None:
    import ast

    allowed = (ast.Expression, ast.Constant, ast.Tuple, ast.List, ast.Set,
               ast.Name, ast.Subscript, ast.UnaryOp, ast.BoolOp, ast.Compare,
               ast.Load, ast.Not, ast.USub, ast.UAdd, ast.And, ast.Or,
               ast.cmpop)
    fields = {"name", "severity", "message", "detail", "ts"}
    for node in ast.walk(tree):
        if not isinstance(node, allowed):
            raise ValueError(
                f"event condition may only use comparisons, and/or/not, "
                f"names, constants, and detail[...] lookups — got "
                f"{type(node).__name__}")
        if isinstance(node, ast.Compare):
            for op in node.ops:
                if type(op).__name__ not in _ALLOWED_CMP:
                    raise ValueError(f"operator {type(op).__name__} not "
                                     f"allowed in event conditions")
        if (isinstance(node, ast.UnaryOp)
                and isinstance(node.op, (ast.USub, ast.UAdd))):
            # unary +/- exists in the grammar only for signed numeric
            # literals ("delta > -1"); over any other operand it would
            # validate here but TypeError at dispatch time — reject at
            # compile time instead
            if not (isinstance(node.operand, ast.Constant)
                    and isinstance(node.operand.value, (int, float))
                    and not isinstance(node.operand.value, bool)):
                raise ValueError(
                    "unary +/- in event conditions applies only to "
                    "numeric literals")
        if isinstance(node, ast.Name) and node.id not in fields:
            raise ValueError(f"unknown event field '{node.id}' "
                             f"(have {sorted(fields)})")


def _compile_condition(condition: str | Callable[[Event], bool] | None
                       ) -> Callable[[Event], bool]:
    """Consumer ``condition`` (reference ``SubscribedEventConsumer``):
    a callable, or a small expression over the event's fields
    (``"severity == 'FAIL'"``) interpreted over a restricted AST grammar —
    never ``eval`` (see ``_eval_condition_node``)."""
    if condition is None:
        return lambda e: True
    if callable(condition):
        return condition
    import ast

    tree = ast.parse(condition, "<event-condition>", mode="eval")
    # validate node types once at subscribe time so bad contracts fail
    # fast, not on the first matching event (structure only — values like
    # detail['k'] can't be probed until a real event arrives)
    _validate_condition_tree(tree)

    def check(event: Event) -> bool:
        names = {"name": event.name, "severity": event.severity,
                 "message": event.message, "detail": event.detail,
                 "ts": event.ts}
        return bool(_eval_condition_node(tree, names))

    return check


def webhook_handler(url: str,
                    transport: Callable[..., Any] | None = None,
                    headers: dict[str, str] | None = None,
                    auth: Any = None,
                    condition: str | Callable[[Event], bool] | None = None,
                    message: str | None = None) -> Callable[[Event], None]:
    """Notification handler: POSTs the event envelope to ``url`` when the
    consumer's ``condition`` holds; ``message`` overrides the envelope
    message (both per the reference's SubscribedEventConsumer fields)."""
    check = _compile_condition(condition)

    def handle(event: Event) -> None:
        if not check(event):
            return
        post_webhook(url, {"name": event.name, "severity": event.severity,
                           "message": message if message is not None
                           else event.message,
                           "detail": event.detail, "ts": event.ts},
                     transport, headers=headers, auth=auth)

    return handle


class EventManager:
    """Subscribe handlers by event name (``*`` = all); dispatch enqueues;
    a daemon consumer drains (reference ``EventManager``)."""

    def __init__(self, synchronous: bool = False):
        self._handlers: dict[str, list[Callable[[Event], None]]] = {}
        self._sync = synchronous
        self._q: queue.Queue[Event | None] = queue.Queue()
        self._errors: list[tuple[Event, Exception]] = []
        self._thread: threading.Thread | None = None
        if not synchronous:
            self._thread = threading.Thread(target=self._consume, daemon=True)
            self._thread.start()

    def subscribe(self, name: str, handler: Callable[[Event], None]) -> None:
        self._handlers.setdefault(name, []).append(handler)

    def dispatch(self, event: Event) -> None:
        if self._sync:
            self._handle(event)
        else:
            self._q.put(event)

    def _handle(self, event: Event) -> None:
        for handler in (*self._handlers.get(event.name, ()),
                        *self._handlers.get("*", ())):
            try:
                handler(event)
            except Exception as e:  # noqa: BLE001 - handler errors recorded
                self._errors.append((event, e))

    def _consume(self) -> None:
        while True:
            ev = self._q.get()
            if ev is None:
                return
            self._handle(ev)

    def stop(self, timeout: float = 10.0) -> None:
        """Drain and stop the consumer (reference ``context.stop()``)."""
        if self._thread is not None:
            self._q.put(None)
            self._thread.join(timeout)

    @property
    def errors(self) -> list[tuple[Event, Exception]]:
        return list(self._errors)
