"""Minimal blocking RESP2 client — the Redis-queue fallback when redis-py
is not installed.

`RedisRequestQueue` (core/request_queue.py) speaks a small command surface:
RPUSH/LPOP/BLPOP/LLEN/LINDEX + GET/SETEX/DEL (+ pipeline batching). This
client covers exactly that against any RESP2 server — a real Redis or the
in-repo native one (`native/miniredis.cc`). API mirrors the redis-py subset
the queue uses, so `import redis` and `RespClient` are interchangeable
there (reference pins redis-py in requirements.txt; this repo works without
it).

Thread safety: one lock around each request/response exchange — the queue
calls from the API threads and the batch-processor thread concurrently.
BLPOP releases the lock only after its reply arrives, like redis-py's
single-connection behavior. Returned values are bytes (decode_responses
False), matching what request_queue.py expects.
"""

from __future__ import annotations

import socket
import threading
from urllib.parse import urlparse


class RespError(Exception):
    pass


class _Pipeline:
    """Queues commands; execute() sends them in one write and reads all
    replies (the one-round-trip LPOP drain in get_batch)."""

    def __init__(self, client: "RespClient"):
        self._client = client
        self._cmds: list = []

    def lpop(self, key):
        self._cmds.append(("LPOP", key))
        return self

    def rpush(self, key, value):
        self._cmds.append(("RPUSH", key, value))
        return self

    def execute(self) -> list:
        cmds, self._cmds = self._cmds, []
        return self._client._execute_many(cmds)


class RespClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 6379,
                 db: int = 0, timeout: float | None = None):
        self._addr = (host, port)
        self._db = db
        self._timeout = timeout
        self._lock = threading.Lock()
        self._sock: socket.socket | None = None
        self._buf = b""

    @classmethod
    def from_url(cls, url: str) -> "RespClient":
        u = urlparse(url)
        db = int(u.path.lstrip("/") or 0) if u.path else 0
        return cls(u.hostname or "127.0.0.1", u.port or 6379, db=db)

    # -- connection -------------------------------------------------------

    def _connect(self) -> socket.socket:
        s = socket.create_connection(self._addr, timeout=self._timeout or 10)
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        s.settimeout(self._timeout)
        self._sock, self._buf = s, b""
        if self._db:
            self._exchange_locked([("SELECT", self._db)])
        return s

    def close(self) -> None:
        with self._lock:
            if self._sock is not None:
                try:
                    self._sock.close()
                finally:
                    self._sock = None

    # -- wire -------------------------------------------------------------

    @staticmethod
    def _encode(cmd: tuple) -> bytes:
        out = [b"*%d\r\n" % len(cmd)]
        for a in cmd:
            if isinstance(a, bytes):
                b = a
            elif isinstance(a, str):
                b = a.encode()
            elif isinstance(a, float):
                b = repr(a).encode()
            else:
                b = str(a).encode()
            out.append(b"$%d\r\n%s\r\n" % (len(b), b))
        return b"".join(out)

    def _read_line(self, s: socket.socket) -> bytes:
        while b"\r\n" not in self._buf:
            chunk = s.recv(65536)
            if not chunk:
                raise ConnectionError("miniredis/redis connection closed")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def _read_exact(self, s: socket.socket, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = s.recv(65536)
            if not chunk:
                raise ConnectionError("miniredis/redis connection closed")
            self._buf += chunk
        data, self._buf = self._buf[:n], self._buf[n:]
        return data

    def _read_reply(self, s: socket.socket):
        line = self._read_line(s)
        t, body = line[:1], line[1:]
        if t == b"+":
            return body
        if t == b"-":
            raise RespError(body.decode(errors="replace"))
        if t == b":":
            return int(body)
        if t == b"$":
            n = int(body)
            if n < 0:
                return None
            data = self._read_exact(s, n + 2)
            return data[:-2]
        if t == b"*":
            n = int(body)
            if n < 0:
                return None
            return [self._read_reply(s) for _ in range(n)]
        raise RespError(f"bad RESP type byte: {line!r}")

    def _exchange_locked(self, cmds: list) -> list:
        s = self._sock or self._connect()
        try:
            s.sendall(b"".join(self._encode(c) for c in cmds))
            return [self._read_reply(s) for _ in cmds]
        except (ConnectionError, OSError):
            # one reconnect attempt (server restart / idle close)
            self._sock = None
            s = self._connect()
            s.sendall(b"".join(self._encode(c) for c in cmds))
            return [self._read_reply(s) for _ in cmds]

    def _execute(self, *cmd):
        with self._lock:
            return self._exchange_locked([cmd])[0]

    def _execute_many(self, cmds: list) -> list:
        if not cmds:
            return []
        with self._lock:
            return self._exchange_locked(cmds)

    # -- the queue's command surface -------------------------------------

    def ping(self) -> bool:
        return self._execute("PING") in (b"PONG", b"OK")

    def rpush(self, key, *values) -> int:
        return self._execute("RPUSH", key, *values)

    def lpop(self, key):
        return self._execute("LPOP", key)

    def blpop(self, key, timeout=0):
        """Returns (key, value) bytes or None — redis-py shape. The socket
        deadline stretches past the server-side block timeout."""
        with self._lock:
            s = self._sock or self._connect()
            old = s.gettimeout()
            s.settimeout((timeout or 30) + 10)
            try:
                s.sendall(self._encode(("BLPOP", key, timeout)))
                reply = self._read_reply(s)
            except (ConnectionError, OSError):
                self._sock = None
                raise
            finally:
                if self._sock is not None:
                    s.settimeout(old)
        return tuple(reply) if reply else None

    def llen(self, key) -> int:
        return self._execute("LLEN", key)

    def lindex(self, key, index):
        return self._execute("LINDEX", key, index)

    def get(self, key):
        return self._execute("GET", key)

    def setex(self, key, ttl, value):
        return self._execute("SETEX", key, int(ttl), value)

    def set(self, key, value, ex=None):
        if ex is not None:
            return self._execute("SET", key, value, "EX", int(ex))
        return self._execute("SET", key, value)

    def delete(self, *keys) -> int:
        return self._execute("DEL", *keys)

    def exists(self, *keys) -> int:
        return self._execute("EXISTS", *keys)

    def flushall(self):
        return self._execute("FLUSHALL")

    def pipeline(self) -> _Pipeline:
        return _Pipeline(self)


def client_from_url(url: str):
    """redis-py if installed (the reference's dependency), else RespClient —
    both speak the subset RedisRequestQueue needs."""
    try:
        import redis

        return redis.from_url(url)
    except ImportError:
        return RespClient.from_url(url)
