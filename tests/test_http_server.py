"""Raw socket-server behaviors of the first-party HTTP stack: keep-alive,
malformed requests, oversized bodies (413), connection: close."""

import asyncio
import http.client
import threading
import time

import pytest

from sskd_tpu.serve.http import App, Request, Response, Server


@pytest.fixture(scope="module")
def server_port():
    app = App()

    @app.get("/ping")
    async def ping(request: Request) -> Response:
        return Response({"pong": True})

    @app.post("/echo")
    async def echo(request: Request) -> Response:
        return Response({"len": len(request.body)})

    port = 18971
    server = Server(app, host="127.0.0.1", port=port)
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(server.serve())

    thread = threading.Thread(target=run, daemon=True)
    thread.start()
    time.sleep(0.5)
    yield port
    loop.call_soon_threadsafe(loop.stop)


def test_keep_alive_reuses_connection(server_port):
    conn = http.client.HTTPConnection("127.0.0.1", server_port, timeout=5)
    for _ in range(3):
        conn.request("GET", "/ping")
        resp = conn.getresponse()
        assert resp.status == 200
        resp.read()
    conn.close()


def test_connection_close_honored(server_port):
    conn = http.client.HTTPConnection("127.0.0.1", server_port, timeout=5)
    conn.request("GET", "/ping", headers={"Connection": "close"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("connection") == "close"
    conn.close()


def test_oversized_body_413(server_port):
    conn = http.client.HTTPConnection("127.0.0.1", server_port, timeout=5)
    # declare an 11MB body; server must reject on the header alone
    conn.putrequest("POST", "/echo")
    conn.putheader("Content-Length", str(11 * 1024 * 1024))
    conn.putheader("Content-Type", "application/json")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()


def test_malformed_request_line_400(server_port):
    import socket

    with socket.create_connection(("127.0.0.1", server_port), timeout=5) as s:
        s.sendall(b"NONSENSE\r\n\r\n")
        data = s.recv(4096)
    assert b"400" in data.split(b"\r\n")[0]


def test_post_roundtrip(server_port):
    conn = http.client.HTTPConnection("127.0.0.1", server_port, timeout=5)
    conn.request("POST", "/echo", body=b"x" * 100)
    resp = conn.getresponse()
    assert resp.status == 200
    import json

    assert json.loads(resp.read())["len"] == 100
    conn.close()
