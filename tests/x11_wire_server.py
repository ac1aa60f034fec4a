"""Minimal X11 wire-protocol server for driving the REAL libX11 client.

The dev environment has no display, so tests/test_viewer_x11.py exercises
X11Viewer's logic with a scripted fake Xlib (C-API level).  This module
closes the remaining inch at the PROTOCOL level: it implements enough of
the core X11 wire protocol (connection handshake + the ~15 requests the
viewer's Xlib surface generates) over a real AF_UNIX socket that the real
`libX11.so.6` can open a Display against it.  Tests then run the genuine
viewer/app code path — real XOpenDisplay, real XPutImage splitting and
byte layout, real GetKeyboardMapping-backed XLookupKeysym — and assert on
the pixel bytes and events that actually cross the socket.

Reference behavior mirrored: show-image's window+event channel
(/root/reference/src/app.rs:148-153 window creation, :213-218 per-frame
blit, :221-224 key-event drain).

Protocol layouts follow the X Window System Protocol spec (X11R7.7),
little-endian variant only (the client and server share this host).
"""

from __future__ import annotations

import os
import socket
import struct
import threading


# Server-assigned constants (arbitrary but self-consistent).
ROOT_WINDOW = 0x000002C0
ROOT_VISUAL = 0x21
DEFAULT_COLORMAP = 0x20
RESOURCE_ID_BASE = 0x00200000
RESOURCE_ID_MASK = 0x001FFFFF
MAX_REQUEST_LEN = 65535  # 4-byte units (no BIG-REQUESTS)

# Keycode -> keysym table (US-layout-ish codes; any 8..255 values work —
# the client learns them via GetKeyboardMapping, nothing is hardcoded on
# the Xlib side).  KEYSYMS_PER_KEYCODE=2: [lowercase, NoSymbol].
KEYCODE_TO_KEYSYM = {
    9: 0xFF1B,  # Escape
    24: 0x0071,  # q
    26: 0x0065,  # e
    38: 0x0061,  # a
    40: 0x0064,  # d
}
KEYSYM_TO_KEYCODE = {v: k for k, v in KEYCODE_TO_KEYSYM.items()}
KEYSYMS_PER_KEYCODE = 2
MIN_KEYCODE, MAX_KEYCODE = 8, 255

# Predefined atoms (X.h) relevant here; InternAtom allocates upward.
PREDEFINED_ATOMS = {"WM_NAME": 39, "STRING": 31}
FIRST_CUSTOM_ATOM = 0x100

CW_EVENT_MASK = 1 << 11
STRUCTURE_NOTIFY_MASK = 1 << 17


def _pad4(n: int) -> int:
    return (4 - (n % 4)) % 4


class MiniXServer:
    """One-client X11 wire server on a unix socket, run via `with`.

    Exposes what crossed the wire:
      windows: wid -> dict(width, height, event_mask, properties{atom: bytes})
      framebuffers: drawable -> bytearray (dense BGRX, width*height*4)
      atoms: name -> id
      requests: list of (opcode, minor) seen, in order
      unknown_opcodes: opcodes answered with an X error

    And server-initiated event injection: send_key(sym, press),
    send_client_message(window, type_atom, data0).
    """

    _next_num = 0

    def __init__(self, display_num: int | None = None):
        if display_num is None:
            # Unique per server instance AND per process (parallel runs).
            MiniXServer._next_num += 1
            display_num = 80 + (os.getpid() * 7 + MiniXServer._next_num) % 400
        self.display_num = display_num
        self.sock_path = f"/tmp/.X11-unix/X{self.display_num}"
        self.windows: dict[int, dict] = {}
        self.framebuffers: dict[int, dict] = {}
        self.atoms = dict(PREDEFINED_ATOMS)
        self.requests: list[tuple[int, int]] = []
        self.unknown_opcodes: list[int] = []
        self.errors: list[str] = []
        self._seq = 0  # sequence number of the last request processed
        self._conn: socket.socket | None = None
        self._listener: socket.socket | None = None
        self._send_lock = threading.Lock()
        self._thread: threading.Thread | None = None
        self._handshake_done = threading.Event()

    # -- lifecycle ----------------------------------------------------------

    def __enter__(self):
        os.makedirs("/tmp/.X11-unix", exist_ok=True)
        # The display number may collide with another process's server
        # (concurrent pytest runs); probe before claiming the path and
        # never unlink a socket something is still listening on.
        for _ in range(50):
            if os.path.exists(self.sock_path):
                probe = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
                try:
                    probe.connect(self.sock_path)
                    alive = True
                except OSError:
                    alive = False
                finally:
                    probe.close()
                if alive:
                    MiniXServer._next_num += 1
                    self.display_num = 80 + (
                        os.getpid() * 7 + MiniXServer._next_num
                    ) % 400
                    self.sock_path = f"/tmp/.X11-unix/X{self.display_num}"
                    continue
                os.unlink(self.sock_path)  # stale leftover
            break
        self._listener = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._listener.bind(self.sock_path)
        self._listener.listen(1)
        # Generous timeouts: the client may pause for a long JIT compile
        # (or a subprocess's jax import) mid-connection; close() unblocks
        # accept/recv by closing the sockets, so these only bound leaks.
        self._listener.settimeout(600.0)
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        for s in (self._conn, self._listener):
            if s is not None:
                try:
                    s.close()
                except OSError:
                    pass
        self._conn = self._listener = None
        if self._thread is not None:
            self._thread.join(timeout=10.0)
            self._thread = None
        try:
            os.unlink(self.sock_path)
        except FileNotFoundError:
            pass

    @property
    def display(self) -> str:
        return f":{self.display_num}"

    # -- wire helpers --------------------------------------------------------

    def _send(self, data: bytes):
        with self._send_lock:
            conn = self._conn
            if conn is not None:
                conn.sendall(data)

    def _reply(self, detail: int, payload24: bytes, extra: bytes = b""):
        """Standard 32-byte reply + `extra` (padded to 4 by the caller)."""
        assert len(payload24) <= 24 and len(extra) % 4 == 0
        head = struct.pack(
            "<BBHI", 1, detail & 0xFF, self._seq & 0xFFFF, len(extra) // 4
        )
        self._send(head + payload24.ljust(24, b"\0") + extra)

    def _error(self, code: int, major: int, bad_value: int = 0):
        self._send(
            struct.pack(
                "<BBHIHBB", 0, code, self._seq & 0xFFFF, bad_value, 0, major, 0
            )
            + b"\0" * 20
        )

    def _event(self, code: int, detail: int, payload28: bytes):
        """32-byte event; sequence = last processed request."""
        assert len(payload28) <= 28
        self._send(
            struct.pack("<BBH", code, detail & 0xFF, self._seq & 0xFFFF)
            + payload28.ljust(28, b"\0")
        )

    # -- server loop ---------------------------------------------------------

    def _serve(self):
        try:
            conn, _ = self._listener.accept()
        except (OSError, socket.timeout):
            return
        conn.settimeout(600.0)
        self._conn = conn
        buf = bytearray()

        def need(n: int) -> bool:
            while len(buf) < n:
                try:
                    chunk = conn.recv(65536)
                except (OSError, socket.timeout):
                    return False
                if not chunk:
                    return False
                buf.extend(chunk)
            return True

        try:
            # Connection setup request: 12-byte prefix + auth strings.
            if not need(12):
                return
            order, _, major, minor, alen, dlen, _ = struct.unpack(
                "<BBHHHHH", buf[:12]
            )
            if order != ord("l"):
                self.errors.append(f"unsupported byte order {order:#x}")
                return
            total = 12 + alen + _pad4(alen) + dlen + _pad4(dlen)
            if not need(total):
                return
            del buf[:total]
            self._send(self._setup_reply())
            self._handshake_done.set()

            # Request stream.
            while True:
                if not need(4):
                    return
                opcode, detail, length = struct.unpack("<BBH", buf[:4])
                nbytes = length * 4
                if nbytes < 4:
                    self.errors.append(f"bad request length {length}")
                    return
                if not need(nbytes):
                    return
                body = bytes(buf[4:nbytes])
                del buf[:nbytes]
                self._seq += 1
                self.requests.append((opcode, detail))
                self._dispatch(opcode, detail, body)
        except Exception as e:  # pragma: no cover - debugging aid
            self.errors.append(repr(e))
        finally:
            self._handshake_done.set()

    def _setup_reply(self) -> bytes:
        vendor = b"tiny_renderer_tpu mini X server"
        vlen = len(vendor)
        formats = struct.pack("<BBB5x", 1, 1, 32) + struct.pack(
            "<BBB5x", 24, 32, 32
        )
        visual = struct.pack(
            "<IBBHIIII",
            ROOT_VISUAL, 4, 8, 256, 0xFF0000, 0x00FF00, 0x0000FF, 0,
        )
        depth = struct.pack("<BxHI", 24, 1, 0) + visual
        screen = struct.pack(
            "<IIIIIHHHHHHIBBBB",
            ROOT_WINDOW, DEFAULT_COLORMAP, 0xFFFFFF, 0, 0,
            1920, 1080, 508, 285, 1, 1,
            ROOT_VISUAL, 0, 0, 24, 1,
        ) + depth
        body = (
            struct.pack(
                "<IIIIHHBBBBBBBBI",
                11_700_000, RESOURCE_ID_BASE, RESOURCE_ID_MASK, 256,
                vlen, MAX_REQUEST_LEN, 1, 2, 0, 0, 32, 32,
                MIN_KEYCODE, MAX_KEYCODE, 0,
            )
            + vendor + b"\0" * _pad4(vlen)
            + formats
            + screen
        )
        head = struct.pack("<BxHHH", 1, 11, 0, len(body) // 4)
        return head + body

    # -- request dispatch ----------------------------------------------------

    def _dispatch(self, opcode: int, detail: int, body: bytes):
        if opcode == 1:  # CreateWindow
            wid, _parent, _x, _y, w, h = struct.unpack("<IIhhHH", body[:16])
            self.windows[wid] = {
                "width": w, "height": h, "event_mask": 0,
                "properties": {}, "mapped": False,
            }
        elif opcode == 2:  # ChangeWindowAttributes
            wid, mask = struct.unpack("<II", body[:8])
            if mask & CW_EVENT_MASK:
                # Values appear in mask bit order; event-mask is bit 11.
                idx = bin(mask & (CW_EVENT_MASK - 1)).count("1")
                (value,) = struct.unpack_from("<I", body, 8 + 4 * idx)
                self.windows.setdefault(
                    wid, {"width": 0, "height": 0, "properties": {},
                          "mapped": False}
                )["event_mask"] = value
        elif opcode == 4:  # DestroyWindow
            pass
        elif opcode == 8:  # MapWindow
            (wid,) = struct.unpack("<I", body[:4])
            win = self.windows.get(wid)
            if win is not None:
                win["mapped"] = True
                if win.get("event_mask", 0) & STRUCTURE_NOTIFY_MASK:
                    self._event(22, 0, struct.pack("<IIB", wid, wid, 0))
        elif opcode in (10, 12):  # UnmapWindow, ConfigureWindow
            pass
        elif opcode == 16:  # InternAtom
            (nlen,) = struct.unpack("<H", body[:2])
            name = body[4 : 4 + nlen].decode("latin-1")
            only_if_exists = bool(detail)
            atom = self.atoms.get(name, 0)
            if atom == 0 and not only_if_exists:
                atom = max(
                    [FIRST_CUSTOM_ATOM - 1, *self.atoms.values()]
                ) + 1
                self.atoms[name] = atom
            self._reply(0, struct.pack("<I", atom))
        elif opcode == 18:  # ChangeProperty
            wid, prop, _ptype, fmt = struct.unpack("<IIIB", body[:13])
            (nunits,) = struct.unpack("<I", body[16:20])
            data = body[20 : 20 + nunits * (fmt // 8)]
            self.windows.setdefault(
                wid, {"width": 0, "height": 0, "event_mask": 0,
                      "mapped": False, "properties": {}}
            )["properties"][prop] = data
        elif opcode == 20:  # GetProperty -> none
            self._reply(0, struct.pack("<III", 0, 0, 0))
        elif opcode == 25:  # SendEvent: echo the event to our one client
            # body = propagate-dest(4) + event-mask(4) + 32-byte event.
            event = body[8:40]
            # Top bit of the code marks send_event (protocol §SendEvent);
            # the server replaces the event's sequence number with the
            # current one — xcb resynchronizes its widened sequence from
            # every incoming packet, so a stale client-side value here
            # desyncs the connection and Xlib aborts with a fatal IO error.
            self._send(
                bytes([event[0] | 0x80, event[1]])
                + struct.pack("<H", self._seq & 0xFFFF)
                + event[4:]
            )
        elif opcode == 43:  # GetInputFocus
            self._reply(0, struct.pack("<I", ROOT_WINDOW))
        elif opcode in (55, 56, 60):  # CreateGC, ChangeGC, FreeGC
            pass
        elif opcode == 61:  # ClearArea
            pass
        elif opcode == 72:  # PutImage
            drawable, _gc, w, h, dx, dy, left_pad, depth = struct.unpack(
                "<IIHHhhBB", body[:18]
            )
            data = body[20:]
            self._put_image(drawable, w, h, dx, dy, depth, data)
        elif opcode == 98:  # QueryExtension -> absent (core protocol only)
            self._reply(0, struct.pack("<BBBB", 0, 0, 0, 0))
        elif opcode == 101:  # GetKeyboardMapping
            first, count = struct.unpack("<BB", body[:2])
            syms = []
            for kc in range(first, first + count):
                syms += [KEYCODE_TO_KEYSYM.get(kc, 0)] + [0] * (
                    KEYSYMS_PER_KEYCODE - 1
                )
            self._reply(
                KEYSYMS_PER_KEYCODE, b"", struct.pack(f"<{len(syms)}I", *syms)
            )
        elif opcode == 119:  # GetModifierMapping -> no modifiers
            n = 2
            self._reply(n, b"", b"\0" * (8 * n))
        elif opcode == 127:  # NoOperation
            pass
        else:
            self.unknown_opcodes.append(opcode)
            self._error(1, opcode)  # BadRequest keeps reply-waiters alive

    def _put_image(self, drawable, w, h, dx, dy, depth, data):
        fb = self.framebuffers.get(drawable)
        if fb is None:
            win = self.windows.get(drawable, {})
            fb = {"width": max(win.get("width", 0), dx + w),
                  "height": max(win.get("height", 0), dy + h),
                  "pixels": b""}
            self.framebuffers[drawable] = fb
        if dx + w > fb["width"] or dy + h > fb["height"]:
            # Grow the dense buffer explicitly (a blit beyond the first
            # request's extent must not silently append past the end).
            nw, nh = max(fb["width"], dx + w), max(fb["height"], dy + h)
            grown = bytearray(nw * nh * 4)
            old = fb["pixels"]
            for row in range(fb["height"]):
                grown[row * nw * 4 : row * nw * 4 + fb["width"] * 4] = (
                    old[row * fb["width"] * 4 : (row + 1) * fb["width"] * 4]
                )
            fb.update(width=nw, height=nh, pixels=grown)
        if not fb["pixels"]:
            fb["pixels"] = bytearray(fb["width"] * fb["height"] * 4)
        stride = w * 4  # depth-24 ZPixmap rows are bpp32, 4-byte aligned
        for row in range(h):
            src = data[row * stride : (row + 1) * stride]
            off = ((dy + row) * fb["width"] + dx) * 4
            fb["pixels"][off : off + len(src)] = src

    # -- server-initiated events ----------------------------------------------

    def wait_connected(self, timeout=10.0) -> bool:
        return self._handshake_done.wait(timeout)

    def send_key(self, keysym: int, press: bool, window: int | None = None):
        """Deliver a KeyPress/KeyRelease for `keysym` to the client."""
        keycode = KEYSYM_TO_KEYCODE[keysym]
        if window is None:
            window = next(iter(self.windows), ROOT_WINDOW)
        payload = struct.pack(
            "<IIIIhhhhHBx",
            0,  # time
            ROOT_WINDOW, window, 0,  # root, event, child
            0, 0, 0, 0,  # root-x/y, event-x/y
            0, 1,  # state, same-screen
        )
        self._event(2 if press else 3, keycode, payload)

    def send_client_message(self, type_atom: int, data0: int,
                            window: int | None = None):
        if window is None:
            window = next(iter(self.windows), ROOT_WINDOW)
        payload = struct.pack("<III", window, type_atom, data0)
        self._event(33, 32, payload)
