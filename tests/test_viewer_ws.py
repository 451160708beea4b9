"""Viewer WebSocket transport (viewer/ws.py + server.py /ws route):
RFC6455 framing, the upgrade handshake, and the server's
preview->refine->training-refresh push loop — the analog of the
reference's Tornado WS pushed frames (server/server.py:89-231)."""
import json
import socket
import threading

import numpy as np
import pytest

from sdfstudio_tpu.viewer import ws


def test_accept_key_rfc_example():
    # RFC 6455 §1.3 worked example
    assert ws.accept_key("dGhlIHNhbXBsZSBub25jZQ==") == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


def test_frame_roundtrip_unmasked_and_masked():
    a, b = socket.socketpair()
    try:
        # unmasked (server-style) frame
        ws.send_frame(a, b"hello", ws.OP_TEXT)
        op, payload = ws.recv_frame(b, timeout=1.0)
        assert (op, payload) == (ws.OP_TEXT, b"hello")

        # masked (client-style) frame, hand-built
        mask = bytes([1, 2, 3, 4])
        data = b"masked-payload"
        framed = bytes([0x80 | ws.OP_TEXT, 0x80 | len(data)]) + mask + bytes(
            c ^ mask[i % 4] for i, c in enumerate(data)
        )
        a.sendall(framed)
        op, payload = ws.recv_frame(b, timeout=1.0)
        assert (op, payload) == (ws.OP_TEXT, data)

        # a 300-byte frame exercises the 16-bit length path
        big = bytes(range(256)) + b"x" * 44
        ws.send_frame(a, big, ws.OP_BINARY)
        op, payload = ws.recv_frame(b, timeout=1.0)
        assert op == ws.OP_BINARY and payload == big

        # timeout returns (None, None); close returns OP_CLOSE
        assert ws.recv_frame(b, timeout=0.05) == (None, None)
        a.close()
        assert ws.recv_frame(b, timeout=0.5)[0] == ws.OP_CLOSE
    finally:
        b.close()


def test_drain_latest_text_coalesces_and_answers_ping():
    a, b = socket.socketpair()
    try:
        ws.send_frame(a, b"older", ws.OP_TEXT)
        ws.send_frame(a, b"ping!", ws.OP_PING)
        ws.send_frame(a, b"newest", ws.OP_TEXT)
        latest, closed = ws.drain_latest_text(b, first_timeout=1.0)
        assert latest == "newest" and not closed
        op, payload = ws.recv_frame(a, timeout=1.0)  # pong came back
        assert (op, payload) == (ws.OP_PONG, b"ping!")
    finally:
        a.close()
        b.close()


# ---------------------------------------------------------------------------
# /ws route integration on a stub state (no trainer; render_pose stubbed)
# ---------------------------------------------------------------------------


class _StubState:
    """ViewerState stand-in: immediate renders, controllable ticks."""

    def __init__(self):
        self.paused = False
        self.ticks = 0
        self.rendered = []
        self.fail = False

    def host_step(self):
        return 123

    def render_pose(self, az, el, radius, width, height, output="rgb", c2w=None):
        if self.fail:
            raise RuntimeError("boom")
        self.rendered.append((width, height, output))
        return np.zeros((height, width, 3), np.uint8)


def _http_upgrade(sock):
    sock.sendall(
        b"GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
        b"Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
        b"Sec-WebSocket-Version: 13\r\n\r\n"
    )
    head = b""
    while b"\r\n\r\n" not in head:
        chunk = sock.recv(4096)
        assert chunk, "server closed during handshake"
        head += chunk
    assert b"101" in head.split(b"\r\n", 1)[0]
    assert b"s3pPLMBiTxaQ9kYGzzhZRbK+xOo=" in head


def _recv_push(sock):
    """One push = a text meta frame followed by a binary PNG frame."""
    op, payload = ws.recv_frame(sock, timeout=10.0)
    assert op == ws.OP_TEXT
    meta = json.loads(payload)
    if "error" in meta:
        return meta, None
    op, png = ws.recv_frame(sock, timeout=10.0)
    assert op == ws.OP_BINARY
    assert png[:4] == b"\x89PNG"
    return meta, png


@pytest.fixture()
def ws_server():
    from http.server import ThreadingHTTPServer

    from sdfstudio_tpu.viewer.server import _make_handler

    state = _StubState()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield state, server.server_address[1]
    server.shutdown()
    server.server_close()


def test_ws_preview_refine_and_training_refresh(ws_server):
    state, port = ws_server
    sock = socket.create_connection(("127.0.0.1", port), timeout=10)
    try:
        _http_upgrade(sock)
        pose = {"c2w": list(range(12)), "width": 256, "height": 256, "output": "rgb"}
        ws.send_frame(sock, json.dumps(pose).encode(), ws.OP_TEXT)

        meta1, png1 = _recv_push(sock)  # fast preview
        assert meta1["w"] == 96 and meta1["step"] == 123 and png1
        meta2, png2 = _recv_push(sock)  # full-res refine
        assert meta2["w"] == 256 and png2

        # no training progress -> no unsolicited frame
        assert ws.recv_frame(sock, timeout=0.8) == (None, None)

        # training progressed -> the held pose is re-pushed at full res
        state.ticks += 1
        meta3, png3 = _recv_push(sock)
        assert meta3["w"] == 256 and png3
        assert [r[0] for r in state.rendered] == [96, 256, 256]
    finally:
        sock.close()


def test_ws_render_error_reported_in_band(ws_server):
    state, port = ws_server
    state.fail = True
    sock = socket.create_connection(("127.0.0.1", port), timeout=10)
    try:
        _http_upgrade(sock)
        ws.send_frame(sock, json.dumps({"width": 64}).encode(), ws.OP_TEXT)
        meta, png = _recv_push(sock)
        assert "boom" in meta["error"] and png is None
    finally:
        sock.close()
