"""HTTP-layer-only ceiling: FastHTTPFrontend with handle_query_json stubbed
to a canned 28 KB body (no batcher, no parse, no assembly), driven by the
same in-process selector client as serve_host_profile. The gap between this
and the host-only serve number is the batcher+parse+assembly budget.

python experiments/http_echo_probe.py [--conns N]
"""

import json
import selectors
import socket
import sys
import time

sys.path.insert(0, ".")

from spaghettisearch_tpu.serve.fastloop import FastHTTPFrontend  # noqa: E402


class StubServer:
    class engine:
        class index:
            n_docs = 1

    batcher = None

    def __init__(self, body: bytes) -> None:
        self._body = body

    def handle_query_json(self, query: str) -> bytes:
        return self._body


def main():
    n_conns = 256
    if "--conns" in sys.argv:
        n_conns = int(sys.argv[sys.argv.index("--conns") + 1])
    body = b"[" + b",".join(b'{"x":"' + b"a" * 500 + b'"}' for _ in range(50)) + b"]"
    print(f"body: {len(body)} bytes")
    front = FastHTTPFrontend(StubServer(body), "/tmp", {})
    host, port = front.start("127.0.0.1", 0)

    payload_body = json.dumps({"query": "warm up test"}).encode()
    payload = (
        b"POST /query HTTP/1.1\r\nHost: b\r\nContent-Type: application/json\r\n"
        b"Content-Length: " + str(len(payload_body)).encode() + b"\r\n\r\n"
        + payload_body
    )

    sel = selectors.DefaultSelector()

    class Conn:
        __slots__ = ("sock", "buf", "need", "done")

        def __init__(self):
            self.sock = socket.create_connection(("127.0.0.1", port))
            self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self.buf = b""
            self.need = -1
            self.done = 0
            sel.register(self.sock, selectors.EVENT_READ, self)
            self.sock.sendall(payload)

        def feed(self):
            data = self.sock.recv(1 << 18)
            if not data:
                return False
            self.buf += data
            while True:
                if self.need < 0:
                    he = self.buf.find(b"\r\n\r\n")
                    if he < 0:
                        return True
                    hdr = self.buf[:he].lower()
                    cl = hdr.find(b"content-length:")
                    self.need = he + 4 + int(hdr[cl + 15 : hdr.find(b"\r", cl)])
                if len(self.buf) < self.need:
                    return True
                self.buf = self.buf[self.need :]
                self.need = -1
                self.done += 1
                self.sock.sendall(payload)

    conns = [Conn() for _ in range(n_conns)]

    def pump(until):
        while time.monotonic() < until:
            for key, _ in sel.select(timeout=0.2):
                if key.data.feed() is False:
                    raise RuntimeError("server closed a connection")

    pump(time.monotonic() + 2.0)
    for c in conns:
        c.done = 0
    t0 = time.perf_counter()
    pump(time.monotonic() + 8.0)
    dt = time.perf_counter() - t0
    total = sum(c.done for c in conns)
    print(f"http echo: {total / dt:.0f} req/s at {len(body)}B bodies, conns={n_conns}")
    front.shutdown()


if __name__ == "__main__":
    main()
