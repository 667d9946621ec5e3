"""Query tracing spans — the engine's analogue of the reference's
OpenTracing shim (/root/reference/src/dqe_span.erl:1-19: start/2,
stop/0, tag/2, log/1 forwarding to an otters/Zipkin client; call sites
/root/reference/src/dqe.erl:181-230 wrap the query lifecycle).

Same surface, same no-op contract: ``start(name, None)`` disables the
whole span (the reference's ``start(_, undefined) -> ok``), so traced
and untraced runs share every other code path. Instead of shipping to
a collector, finished spans land in an in-process ring (``finished()``)
and can be dumped as JSON next to the slow-query artifacts — the
diagnostic intent (where did this query's time go) without inventing a
wire protocol the container can't test.

Thread safety: the active-span stack is a ``contextvars.ContextVar``,
so concurrent queries (engine.collect's timeout worker threads) trace
independently.
"""

from __future__ import annotations

import contextvars
import json
import time
from collections import deque
from dataclasses import dataclass, field
from pathlib import Path

__all__ = ["start", "stop", "tag", "log", "span", "finished", "dump"]


@dataclass
class Span:
    name: str
    trace_id: str
    t0: float = field(default_factory=time.monotonic)
    wall0: float = field(default_factory=time.time)
    tags: dict = field(default_factory=dict)
    logs: list = field(default_factory=list)
    children: list = field(default_factory=list)
    duration_ms: int | None = None

    def as_dict(self) -> dict:
        return {
            "name": self.name,
            "trace_id": self.trace_id,
            "start_unix_ms": int(self.wall0 * 1000),
            "duration_ms": self.duration_ms,
            "tags": dict(self.tags),
            "logs": list(self.logs),
            "children": [c.as_dict() for c in self.children],
        }


_stack: contextvars.ContextVar[tuple] = contextvars.ContextVar(
    "dqe_span_stack", default=()
)
#: bounded ring of finished ROOT spans (newest last)
_FINISHED: deque = deque(maxlen=256)


def start(name: str, trace_id: str | None) -> None:
    """Open a span. ``trace_id=None`` is a no-op — untraced queries
    pay nothing (dqe_span.erl:6-7). Nested starts while a span is
    active become child spans regardless of their trace_id."""
    stack = _stack.get()
    if trace_id is None and not stack:
        return
    parent = stack[-1] if stack else None
    sp = Span(str(name), trace_id if trace_id is not None else parent.trace_id)
    if parent is not None:
        parent.children.append(sp)
    _stack.set(stack + (sp,))


def stop() -> None:
    """Close the innermost open span (dqe_span.erl ``stop/0``); root
    spans move to the finished ring. No-op when nothing is open."""
    stack = _stack.get()
    if not stack:
        return
    sp = stack[-1]
    sp.duration_ms = int((time.monotonic() - sp.t0) * 1000)
    _stack.set(stack[:-1])
    if len(stack) == 1:
        _FINISHED.append(sp)


def tag(key, value) -> None:
    """Attach a key/value to the active span (dqe_span.erl ``tag/2``);
    silently ignored when untraced, like the reference."""
    stack = _stack.get()
    if stack:
        stack[-1].tags[str(key)] = value


def log(text: str) -> None:
    """Timestamped note on the active span (dqe_span.erl ``log/1``)."""
    stack = _stack.get()
    if stack:
        sp = stack[-1]
        sp.logs.append(
            {"offset_ms": int((time.monotonic() - sp.t0) * 1000), "text": text}
        )


class span:
    """Context-manager sugar over start/stop (exception-safe)."""

    def __init__(self, name: str, trace_id: str | None):
        self.name, self.trace_id = name, trace_id

    def __enter__(self):
        start(self.name, self.trace_id)
        return self

    def __exit__(self, *exc):
        stop()
        return False


def finished(trace_id: str | None = None) -> list[dict]:
    """Finished root spans (newest last), optionally filtered."""
    out = [s.as_dict() for s in _FINISHED]
    if trace_id is not None:
        out = [s for s in out if s["trace_id"] == trace_id]
    return out


def dump(out_path: str, trace_id: str | None = None) -> Path:
    """Write finished spans as JSON (the debug-folder artifact shape,
    next to engine._debug_artifact's plan dumps)."""
    p = Path(out_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(finished(trace_id), indent=2))
    return p
