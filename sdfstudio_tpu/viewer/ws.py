"""Minimal server-side WebSocket (RFC 6455) over an http.server socket.

The reference viewer transports frames over a Tornado WebSocket pushed
from the training process (reference nerfstudio/viewer/server/server.py:
89-231). This module gives the stdlib-only viewer the same push
transport without new dependencies: the `/ws` route upgrades the
connection in-place and the handler thread drives a coalescing
render-push loop (viewer/server.py). Only what browsers actually send is
implemented: unfragmented masked client frames (text/ping/close) and
unmasked server frames (text/binary/pong/close).
"""
from __future__ import annotations

import base64
import hashlib
import socket
import struct

_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


def accept_key(sec_websocket_key: str) -> str:
    digest = hashlib.sha1((sec_websocket_key + _MAGIC).encode()).digest()
    return base64.b64encode(digest).decode()


def handshake_response(sec_websocket_key: str) -> bytes:
    return (
        "HTTP/1.1 101 Switching Protocols\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Accept: {accept_key(sec_websocket_key)}\r\n"
        "\r\n"
    ).encode()


def send_frame(sock: socket.socket, payload: bytes, opcode: int) -> None:
    """One unmasked server->client frame (FIN set)."""
    n = len(payload)
    header = bytes([0x80 | opcode])
    if n < 126:
        header += bytes([n])
    elif n < 1 << 16:
        header += bytes([126]) + struct.pack(">H", n)
    else:
        header += bytes([127]) + struct.pack(">Q", n)
    sock.sendall(header + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None  # peer closed
        buf += chunk
    return buf


def recv_frame(sock: socket.socket, timeout: float):
    """Receive one client frame.

    Returns (opcode, payload-bytes), or (None, None) on read timeout, or
    (OP_CLOSE, b"") when the peer closed (cleanly or by TCP reset).
    Client frames are always masked (RFC 6455 §5.1)."""
    sock.settimeout(timeout)
    try:
        head = _recv_exact(sock, 2)
        if head is None:
            return OP_CLOSE, b""
        opcode = head[0] & 0x0F
        masked = head[1] & 0x80
        length = head[1] & 0x7F
        if length == 126:
            length = struct.unpack(">H", _recv_exact(sock, 2))[0]
        elif length == 127:
            length = struct.unpack(">Q", _recv_exact(sock, 8))[0]
        mask = _recv_exact(sock, 4) if masked else b"\x00" * 4
        payload = _recv_exact(sock, length) if length else b""
        if payload is None or mask is None:
            return OP_CLOSE, b""
        if masked:
            payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        return opcode, payload
    except socket.timeout:
        return None, None
    except (ConnectionError, OSError):
        return OP_CLOSE, b""
    finally:
        sock.settimeout(None)


def drain_latest_text(sock: socket.socket, first_timeout: float):
    """Wait up to ``first_timeout`` for a frame, then keep reading without
    waiting and return the LATEST text payload (camera messages coalesce:
    only the newest pose matters). Answers pings. Returns
    (latest_text_or_None, closed: bool)."""
    latest = None
    timeout = first_timeout
    while True:
        opcode, payload = recv_frame(sock, timeout)
        if opcode is None:  # timed out — nothing more pending
            return latest, False
        if opcode == OP_CLOSE:
            return latest, True
        if opcode == OP_PING:
            try:
                send_frame(sock, payload, OP_PONG)
            except OSError:
                return latest, True
        elif opcode == OP_TEXT:
            latest = payload.decode("utf-8", "replace")
        timeout = 0.001  # already got one frame; just drain the backlog
