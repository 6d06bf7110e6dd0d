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
        try:
            return transport(url, body, hdrs)
        except TypeError:  # legacy 2-arg transports
            return transport(url, body)
    from urllib.request import Request, urlopen  # pragma: no cover

    req = Request(url, data=body, headers=hdrs)
    with urlopen(req, timeout=30) as resp:  # pragma: no cover
        return resp.read()


def _compile_condition(condition: str | Callable[[Event], bool] | None
                       ) -> Callable[[Event], bool]:
    """Consumer ``condition`` (reference ``SubscribedEventConsumer``):
    a callable, or a small expression over the event's fields
    (``"severity == 'FAIL'"``) evaluated with no builtins."""
    if condition is None:
        return lambda e: True
    if callable(condition):
        return condition
    code = compile(condition, "<event-condition>", "eval")

    def check(event: Event) -> bool:
        names = {"name": event.name, "severity": event.severity,
                 "message": event.message, "detail": event.detail,
                 "ts": event.ts}
        return bool(eval(code, {"__builtins__": {}}, names))  # noqa: S307

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
