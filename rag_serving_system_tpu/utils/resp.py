"""Minimal blocking RESP2 client — the Redis-queue fallback when redis-py
is not installed.

`RedisRequestQueue` (core/request_queue.py) speaks a small command surface:
RPUSH/LPOP/BLPOP/LLEN/LINDEX + GET/SETEX/DEL (+ pipeline batching). This
client covers exactly that against any RESP2 server — a real Redis or the
in-repo native one (`native/miniredis.cc`). API mirrors the redis-py subset
the queue uses, so `import redis` and `RespClient` are interchangeable
there (reference pins redis-py in requirements.txt; this repo works without
it).

Concurrency: a CONNECTION POOL, like redis-py's — each request/response
exchange checks a socket out of an idle stack (dialing a new one when
empty) and returns it afterwards, so the API role's result-poll thread pool
(endpoints.py builds 256 workers for the Redis backend) never serializes on
a single socket, and a BLPOP blocking one connection never delays SETEX
result stores from another thread. Returned values are bytes
(decode_responses False), matching what request_queue.py expects.
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

    def setex(self, key, ttl, value):
        self._cmds.append(("SETEX", key, int(ttl), value))
        return self

    def execute(self) -> list:
        cmds, self._cmds = self._cmds, []
        return self._client._execute_many(cmds)


class _Conn:
    """One pooled socket + its read buffer."""

    __slots__ = ("sock", "buf")

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.buf = b""


class RespClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 6379,
                 db: int = 0, timeout: float | None = None,
                 max_idle: int = 64):
        self._addr = (host, port)
        self._db = db
        self._timeout = timeout
        self._max_idle = max_idle
        self._lock = threading.Lock()   # guards the idle stack only
        self._idle: list[_Conn] = []

    @classmethod
    def from_url(cls, url: str) -> "RespClient":
        u = urlparse(url)
        db = int(u.path.lstrip("/") or 0) if u.path else 0
        return cls(u.hostname or "127.0.0.1", u.port or 6379, db=db)

    # -- connection pool ----------------------------------------------------

    def _dial(self) -> _Conn:
        s = socket.create_connection(self._addr, timeout=self._timeout or 10)
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        s.settimeout(self._timeout)
        conn = _Conn(s)
        if self._db:
            self._exchange_on(conn, [("SELECT", self._db)])
        return conn

    def _acquire(self) -> _Conn:
        with self._lock:
            if self._idle:
                return self._idle.pop()
        return self._dial()

    def _release(self, conn: _Conn) -> None:
        with self._lock:
            if len(self._idle) < self._max_idle:
                self._idle.append(conn)
                return
        try:
            conn.sock.close()
        except OSError:
            pass

    def _discard(self, conn: _Conn) -> None:
        try:
            conn.sock.close()
        except OSError:
            pass

    def close(self) -> None:
        with self._lock:
            idle, self._idle = self._idle, []
        for c in idle:
            try:
                c.sock.close()
            except OSError:
                pass

    # -- wire -----------------------------------------------------------------

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

    @staticmethod
    def _read_line(conn: _Conn) -> bytes:
        while b"\r\n" not in conn.buf:
            chunk = conn.sock.recv(65536)
            if not chunk:
                raise ConnectionError("miniredis/redis connection closed")
            conn.buf += chunk
        line, conn.buf = conn.buf.split(b"\r\n", 1)
        return line

    @staticmethod
    def _read_exact(conn: _Conn, n: int) -> bytes:
        while len(conn.buf) < n:
            chunk = conn.sock.recv(65536)
            if not chunk:
                raise ConnectionError("miniredis/redis connection closed")
            conn.buf += chunk
        data, conn.buf = conn.buf[:n], conn.buf[n:]
        return data

    def _read_reply(self, conn: _Conn):
        line = self._read_line(conn)
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
            data = self._read_exact(conn, n + 2)
            return data[:-2]
        if t == b"*":
            n = int(body)
            if n < 0:
                return None
            return [self._read_reply(conn) for _ in range(n)]
        raise RespError(f"bad RESP type byte: {line!r}")

    def _exchange_on(self, conn: _Conn, cmds: list) -> list:
        conn.sock.sendall(b"".join(self._encode(c) for c in cmds))
        return [self._read_reply(conn) for _ in cmds]

    def _exchange(self, cmds: list) -> list:
        conn = self._acquire()
        try:
            out = self._exchange_on(conn, cmds)
        except (ConnectionError, OSError):
            # pooled socket may have idled out — one fresh-dial retry
            self._discard(conn)
            conn = self._dial()
            try:
                out = self._exchange_on(conn, cmds)
            except (ConnectionError, OSError):
                self._discard(conn)
                raise
        self._release(conn)
        return out

    def _execute(self, *cmd):
        return self._exchange([cmd])[0]

    def _execute_many(self, cmds: list) -> list:
        if not cmds:
            return []
        return self._exchange(cmds)

    # -- the queue's command surface ------------------------------------------

    def ping(self) -> bool:
        return self._execute("PING") in (b"PONG", b"OK")

    def rpush(self, key, *values) -> int:
        return self._execute("RPUSH", key, *values)

    def lpop(self, key):
        return self._execute("LPOP", key)

    def blpop(self, key, timeout=0):
        """Returns (key, value) bytes or None — redis-py shape. The socket
        deadline stretches past the server-side block timeout; the blocking
        connection is checked out of the pool, so other threads' commands
        proceed on their own sockets meanwhile."""
        conn = self._acquire()
        old = conn.sock.gettimeout()
        # timeout=0 asks the SERVER to block forever — the client socket must
        # then have no deadline of its own
        conn.sock.settimeout(timeout + 10 if timeout else None)
        try:
            conn.sock.sendall(self._encode(("BLPOP", key, timeout)))
            reply = self._read_reply(conn)
        except (ConnectionError, OSError):
            self._discard(conn)
            raise
        conn.sock.settimeout(old)
        self._release(conn)
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

    def info(self) -> dict:
        """Parse the INFO reply into a {field: value} dict (ints where
        possible) — enough to read miniredis's used_memory/maxmemory."""
        raw = self._execute("INFO")
        out = {}
        for line in (raw or b"").decode().splitlines():
            if ":" in line and not line.startswith("#"):
                k, _, v = line.partition(":")
                try:
                    out[k] = int(v)
                except ValueError:
                    out[k] = v
        return out

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
