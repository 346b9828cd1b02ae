"""In-process mp3 / Ogg Vorbis codecs via the system codec libraries.

Closes the last "decode anything needs ffmpeg" dependency (SURVEY.md §3.1
row 7: the reference's AudiofileToWavStream decodes mp3/ogg through
miniaudio/ffmpeg — reference synthplayer/streaming.py): when the host has
the stock codec shared libraries (libmpg123, libvorbisfile; encoders
libmp3lame, libvorbisenc + libogg), we bind them directly with ctypes —
no subprocess, no python package, no copy of the codec.  Every entry
point degrades to ``DecodeError``/``EncodeError`` when a library is
absent so the streaming ladder can fall through to ffmpeg.

Decoders return the same ``(frames [n, ch] int16, rate, width=2, nch)``
tuple as the other in-process parsers in ``utils.decoders``; encoders
take int16 frame arrays.  MPEG decode covers layers I/II/III (mpg123
decodes all three), with gapless trimming of the LAME encoder
delay/padding when the stream carries a LAME info tag — which
``write_mp3`` writes, so an encode→decode round trip is sample-count
exact.
"""

from __future__ import annotations

import ctypes
import os
from ctypes import (POINTER, byref, c_char_p, c_double, c_float, c_int,
                    c_int64, c_long, c_size_t, c_ubyte, c_void_p)
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "CodecError", "have_mpg123", "have_lame", "have_vorbisfile",
    "have_vorbisenc", "read_mpeg", "probe_mpeg", "write_mp3",
    "read_vorbis", "probe_vorbis", "write_vorbis",
    "looks_like_mpeg", "looks_like_ogg",
]


class CodecError(Exception):
    """A codec library is missing or rejected the data."""


# ---------------------------------------------------------------------------
# library loading (lazy, cached; absence is a normal condition)
# ---------------------------------------------------------------------------

_LIBS: dict = {}


def _lib(key: str, sonames: Tuple[str, ...]):
    if key not in _LIBS:
        handle = None
        for name in sonames:
            try:
                handle = ctypes.CDLL(name)
                break
            except OSError:
                continue
        _LIBS[key] = handle
    return _LIBS[key]


def _mpg123():
    return _lib("mpg123", ("libmpg123.so.0", "libmpg123.so"))


def _lame():
    return _lib("lame", ("libmp3lame.so.0", "libmp3lame.so"))


def _vorbisfile():
    return _lib("vorbisfile", ("libvorbisfile.so.3", "libvorbisfile.so"))


def _vorbis():
    return _lib("vorbis", ("libvorbis.so.0", "libvorbis.so"))


def _vorbisenc():
    return _lib("vorbisenc", ("libvorbisenc.so.2", "libvorbisenc.so"))


def _ogg():
    return _lib("ogg", ("libogg.so.0", "libogg.so"))


def have_mpg123() -> bool:
    return _mpg123() is not None


def have_lame() -> bool:
    return _lame() is not None


def have_vorbisfile() -> bool:
    return _vorbisfile() is not None and _vorbis() is not None


def have_vorbisenc() -> bool:
    return (_vorbisenc() is not None and _vorbis() is not None
            and _ogg() is not None)


# ---------------------------------------------------------------------------
# magic sniffing (extension-agnostic, like the other in-process decoders)
# ---------------------------------------------------------------------------

def looks_like_mpeg(magic: bytes) -> bool:
    """ID3v2-tagged or raw-framed MPEG audio (layers I/II/III)."""
    if magic[:3] == b"ID3":
        return True
    if len(magic) >= 2 and magic[0] == 0xFF and (magic[1] & 0xE0) == 0xE0:
        layer = (magic[1] >> 1) & 0x3
        version = (magic[1] >> 3) & 0x3
        return layer != 0 and version != 1     # both 0b01/0b00 reserved
    return False


def looks_like_ogg(magic: bytes) -> bool:
    return magic[:4] == b"OggS"


# ---------------------------------------------------------------------------
# MPEG audio decode (libmpg123)
# ---------------------------------------------------------------------------

_MPG123_OK = 0
_MPG123_DONE = -12
_MPG123_NEW_FORMAT = -11
_MPG123_ENC_SIGNED_16 = 0xD0
_MPG123_MONO = 1
_MPG123_STEREO = 2

_mpg123_ready = False


def _sym(lib, *names):
    """First exported symbol of ``names`` (mpg123 ships _64 LFS aliases
    on some builds and plain names on others)."""
    for n in names:
        try:
            return getattr(lib, n)
        except AttributeError:
            continue
    raise CodecError(f"none of {names} exported by the codec library")


def _mpg123_handle():
    """New mpg123 handle configured to emit native-rate s16 only."""
    global _mpg123_ready
    lib = _mpg123()
    if lib is None:
        raise CodecError("libmpg123 is not available on this system")
    if not _mpg123_ready:
        lib.mpg123_init.restype = c_int
        lib.mpg123_init()
        _mpg123_ready = True
    err = c_int(0)
    lib.mpg123_new.restype = c_void_p
    lib.mpg123_new.argtypes = [c_char_p, POINTER(c_int)]
    h = lib.mpg123_new(None, byref(err))
    if not h:
        raise CodecError(f"mpg123_new failed (error {err.value})")
    try:
        # force 16-bit signed output at any rate/channel count the
        # stream has (no resampling inside the decoder)
        lib.mpg123_format_none.argtypes = [c_void_p]
        lib.mpg123_format_none(h)
        rates = POINTER(c_long)()
        nrates = c_size_t(0)
        lib.mpg123_rates.argtypes = [POINTER(POINTER(c_long)),
                                     POINTER(c_size_t)]
        lib.mpg123_rates(byref(rates), byref(nrates))
        fmt = _sym(lib, "mpg123_format", "mpg123_fmt")
        fmt.argtypes = [c_void_p, c_long, c_int, c_int]
        for i in range(nrates.value):
            fmt(h, rates[i], _MPG123_MONO | _MPG123_STEREO,
                _MPG123_ENC_SIGNED_16)
    except Exception:
        lib.mpg123_delete(h)
        raise
    return lib, h


def _mpg123_open(lib, h, filename: str) -> None:
    op = _sym(lib, "mpg123_open_64", "mpg123_open")
    op.argtypes = [c_void_p, c_char_p]
    op.restype = c_int
    if op(h, os.fsencode(filename)) != _MPG123_OK:
        raise CodecError(f"mpg123 cannot open {filename!r}")


def _mpg123_format(lib, h) -> Tuple[int, int]:
    rate = c_long(0)
    ch = c_int(0)
    enc = c_int(0)
    gf = _sym(lib, "mpg123_getformat", "mpg123_getformat_64")
    gf.argtypes = [c_void_p, POINTER(c_long), POINTER(c_int),
                   POINTER(c_int)]
    if gf(h, byref(rate), byref(ch), byref(enc)) != _MPG123_OK:
        raise CodecError("mpg123_getformat failed")
    if enc.value != _MPG123_ENC_SIGNED_16:
        raise CodecError(f"mpg123 produced encoding {enc.value:#x}, "
                         f"expected s16")
    return rate.value, ch.value


def read_mpeg(filename: str) -> Tuple[np.ndarray, int, int, int]:
    """Decode an MPEG audio file (mp3/mp2/mp1, ID3 tags skipped) ->
    (frames [n, ch] int16, rate, 2, nch).  Gapless when the stream has a
    LAME info tag.  Raises CodecError without libmpg123."""
    lib, h = _mpg123_handle()
    try:
        _mpg123_open(lib, h, filename)
        try:
            # a full scan makes mpg123_length exact and locks gapless
            # trimming to the LAME tag when present
            lib.mpg123_scan.argtypes = [c_void_p]
            lib.mpg123_scan(h)
            rate, nch = _mpg123_format(lib, h)
            lib.mpg123_read.argtypes = [c_void_p, c_void_p, c_size_t,
                                        POINTER(c_size_t)]
            lib.mpg123_read.restype = c_int
            chunks = []
            buf = ctypes.create_string_buffer(1 << 18)
            done = c_size_t(0)
            while True:
                ret = lib.mpg123_read(h, buf, len(buf), byref(done))
                if done.value:
                    chunks.append(buf.raw[:done.value])
                if ret == _MPG123_DONE:
                    break
                if ret == _MPG123_NEW_FORMAT:
                    r2, c2 = _mpg123_format(lib, h)
                    if (r2, c2) != (rate, nch):
                        raise CodecError(
                            f"mid-stream format change "
                            f"{rate}Hz/{nch}ch -> {r2}Hz/{c2}ch")
                    continue
                if ret != _MPG123_OK:
                    if chunks:
                        break          # salvage a truncated tail
                    raise CodecError(_mpg123_error(lib, h, ret))
            data = b"".join(chunks)
            if not data:
                raise CodecError(f"no MPEG audio frames in {filename!r}")
            a = np.frombuffer(data, np.int16)
            return a.reshape(-1, nch), rate, 2, nch
        finally:
            lib.mpg123_close.argtypes = [c_void_p]
            lib.mpg123_close(h)
    finally:
        lib.mpg123_delete.argtypes = [c_void_p]
        lib.mpg123_delete(h)


def _mpg123_error(lib, h, code: int) -> str:
    try:
        lib.mpg123_strerror.restype = c_char_p
        lib.mpg123_strerror.argtypes = [c_void_p]
        msg = lib.mpg123_strerror(h)
        return (msg or b"").decode("utf-8", "replace") or f"error {code}"
    except Exception:
        return f"mpg123 error {code}"


def probe_mpeg(filename: str) -> Tuple[int, int, int]:
    """Header-only probe -> (nframes, rate, nch) by scanning the frame
    headers (no PCM synthesis — cheap enough for library indexers)."""
    lib, h = _mpg123_handle()
    try:
        _mpg123_open(lib, h, filename)
        try:
            lib.mpg123_scan.argtypes = [c_void_p]
            if lib.mpg123_scan(h) != _MPG123_OK:
                raise CodecError(f"mpg123 cannot scan {filename!r}")
            rate, nch = _mpg123_format(lib, h)
            ln = _sym(lib, "mpg123_length_64", "mpg123_length")
            ln.argtypes = [c_void_p]
            ln.restype = c_int64
            n = ln(h)
            if n < 0:
                raise CodecError(f"mpg123 cannot size {filename!r}")
            return int(n), rate, nch
        finally:
            lib.mpg123_close.argtypes = [c_void_p]
            lib.mpg123_close(h)
    finally:
        lib.mpg123_delete.argtypes = [c_void_p]
        lib.mpg123_delete(h)


# ---------------------------------------------------------------------------
# MP3 encode (libmp3lame)
# ---------------------------------------------------------------------------

def write_mp3(file, frames: np.ndarray, samplerate: int,
              nchannels: int, bitrate: int = 192) -> None:
    """Encode int16 frames [n, ch] to MP3 (CBR ``bitrate`` kbps) with a
    LAME info tag so gapless decoders recover the exact sample count."""
    lib = _lame()
    if lib is None:
        raise CodecError("libmp3lame is not available on this system")
    frames = np.ascontiguousarray(frames, np.int16)
    if frames.ndim == 1:
        frames = frames[:, None]
    n, ch = frames.shape
    if ch != nchannels:
        raise CodecError(f"frame array has {ch} channels, "
                         f"caller says {nchannels}")
    if ch not in (1, 2):
        raise CodecError(f"mp3 supports 1 or 2 channels, got {ch}")
    lib.lame_init.restype = c_void_p
    gf = lib.lame_init()
    if not gf:
        raise CodecError("lame_init failed")
    out = bytearray()
    try:
        for setter, val in (("lame_set_in_samplerate", samplerate),
                            ("lame_set_num_channels", ch),
                            ("lame_set_brate", bitrate),
                            ("lame_set_quality", 2),
                            ("lame_set_bWriteVbrTag", 1)):
            f = getattr(lib, setter)
            f.argtypes = [c_void_p, c_int]
            f(gf, val)
        lib.lame_init_params.argtypes = [c_void_p]
        if lib.lame_init_params(gf) < 0:
            raise CodecError(f"lame rejected {samplerate} Hz/{ch}ch/"
                             f"{bitrate} kbps")
        buf = ctypes.create_string_buffer(int(1.25 * n) + 7200 + (1 << 14))
        pcm = frames.ctypes.data_as(POINTER(ctypes.c_short))
        if ch == 2:
            enc = lib.lame_encode_buffer_interleaved
            enc.argtypes = [c_void_p, POINTER(ctypes.c_short), c_int,
                            c_void_p, c_int]
            nb = enc(gf, pcm, n, buf, len(buf))
        else:
            enc = lib.lame_encode_buffer
            enc.argtypes = [c_void_p, POINTER(ctypes.c_short),
                            POINTER(ctypes.c_short), c_int, c_void_p, c_int]
            nb = enc(gf, pcm, pcm, n, buf, len(buf))
        if nb < 0:
            raise CodecError(f"lame encode failed ({nb})")
        out += buf.raw[:nb]
        lib.lame_encode_flush.argtypes = [c_void_p, c_void_p, c_int]
        nb = lib.lame_encode_flush(gf, buf, len(buf))
        if nb < 0:
            raise CodecError(f"lame flush failed ({nb})")
        out += buf.raw[:nb]
        # the info tag (delay/padding for gapless decode) overwrites the
        # placeholder frame lame put at the stream head
        lib.lame_get_lametag_frame.argtypes = [c_void_p, c_void_p,
                                               c_size_t]
        lib.lame_get_lametag_frame.restype = c_size_t
        tn = lib.lame_get_lametag_frame(gf, buf, len(buf))
        if 0 < tn <= len(out):
            out[:tn] = buf.raw[:tn]
    finally:
        lib.lame_close.argtypes = [c_void_p]
        lib.lame_close(gf)
    _write_bytes(file, bytes(out))


def _write_bytes(file, data: bytes) -> None:
    if isinstance(file, (str, os.PathLike)):
        with open(file, "wb") as f:
            f.write(data)
    else:
        file.write(data)


# ---------------------------------------------------------------------------
# Ogg Vorbis decode (libvorbisfile)
# ---------------------------------------------------------------------------

class _VorbisInfo(ctypes.Structure):
    # public ABI (codec.h): version/channels/rate + bitrate hints
    _fields_ = [("version", c_int), ("channels", c_int), ("rate", c_long),
                ("bitrate_upper", c_long), ("bitrate_nominal", c_long),
                ("bitrate_lower", c_long), ("bitrate_window", c_long),
                ("codec_setup", c_void_p)]


_OV_FILE_SIZE = 4096       # sizeof(OggVorbis_File) is ~944 on 64-bit;
                           # opaque here, generously over-allocated


def _ov_open(filename: str):
    vfl = _vorbisfile()
    if vfl is None or _vorbis() is None:
        raise CodecError("libvorbisfile is not available on this system")
    vf = ctypes.create_string_buffer(_OV_FILE_SIZE)
    vfl.ov_fopen.argtypes = [c_char_p, c_void_p]
    vfl.ov_fopen.restype = c_int
    ret = vfl.ov_fopen(os.fsencode(filename), vf)
    if ret != 0:
        raise CodecError(f"not an Ogg Vorbis stream: {filename!r} "
                         f"(ov_fopen {ret})")
    return vfl, vf


def _ov_info(vfl, vf) -> Tuple[int, int]:
    vfl.ov_info.argtypes = [c_void_p, c_int]
    vfl.ov_info.restype = POINTER(_VorbisInfo)
    info = vfl.ov_info(vf, -1)
    if not info:
        raise CodecError("ov_info failed")
    return info.contents.rate, info.contents.channels


def read_vorbis(filename: str) -> Tuple[np.ndarray, int, int, int]:
    """Decode an Ogg Vorbis file -> (frames [n, ch] int16, rate, 2, nch).
    Raises CodecError without libvorbisfile (or for Ogg streams carrying
    a non-Vorbis codec: opus/flac/theora fall through to ffmpeg)."""
    vfl, vf = _ov_open(filename)
    try:
        rate, nch = _ov_info(vfl, vf)
        vfl.ov_read.argtypes = [c_void_p, c_void_p, c_int, c_int, c_int,
                                c_int, POINTER(c_int)]
        vfl.ov_read.restype = c_long
        buf = ctypes.create_string_buffer(1 << 16)
        sect = c_int(0)
        chunks = []
        while True:
            nb = vfl.ov_read(vf, buf, len(buf), 0, 2, 1, byref(sect))
            if nb == 0:
                break
            if nb < 0:
                continue               # OV_HOLE etc: skip damaged page
            r2, c2 = _ov_info(vfl, vf)
            if (r2, c2) != (rate, nch):
                raise CodecError(f"chained Ogg stream changes format "
                                 f"{rate}/{nch} -> {r2}/{c2}")
            chunks.append(buf.raw[:nb])
        data = b"".join(chunks)
        if not data:
            raise CodecError(f"no Vorbis audio in {filename!r}")
        a = np.frombuffer(data, np.int16)
        return a.reshape(-1, nch), rate, 2, nch
    finally:
        vfl.ov_clear.argtypes = [c_void_p]
        vfl.ov_clear(vf)


def probe_vorbis(filename: str) -> Tuple[int, int, int]:
    """Header-only probe -> (nframes, rate, nch) from the Ogg page
    granule positions (no PCM synthesis)."""
    vfl, vf = _ov_open(filename)
    try:
        rate, nch = _ov_info(vfl, vf)
        vfl.ov_pcm_total.argtypes = [c_void_p, c_int]
        vfl.ov_pcm_total.restype = c_int64
        n = vfl.ov_pcm_total(vf, -1)
        if n < 0:
            raise CodecError(f"unseekable Ogg stream {filename!r}")
        return int(n), rate, nch
    finally:
        vfl.ov_clear.argtypes = [c_void_p]
        vfl.ov_clear(vf)


# ---------------------------------------------------------------------------
# Ogg Vorbis encode (libvorbisenc + libvorbis + libogg)
# ---------------------------------------------------------------------------

class _OggPacket(ctypes.Structure):
    _fields_ = [("packet", POINTER(c_ubyte)), ("bytes", c_long),
                ("b_o_s", c_long), ("e_o_s", c_long),
                ("granulepos", c_int64), ("packetno", c_int64)]


class _OggPage(ctypes.Structure):
    _fields_ = [("header", POINTER(c_ubyte)), ("header_len", c_long),
                ("body", POINTER(c_ubyte)), ("body_len", c_long)]


# opaque state blocks, over-allocated well past their real sizeof
_DSP_SIZE = 1024
_BLOCK_SIZE = 1024
_STREAM_SIZE = 2048


def write_vorbis(file, frames: np.ndarray, samplerate: int,
                 nchannels: int, quality: float = 0.4) -> None:
    """Encode int16 frames [n, ch] to Ogg Vorbis (VBR ``quality`` in
    -0.1..1.0, the libvorbisenc scale; 0.4 ≈ ~128 kbps stereo)."""
    venc, vor, ogg = _vorbisenc(), _vorbis(), _ogg()
    if venc is None or vor is None or ogg is None:
        raise CodecError("libvorbisenc/libogg are not available "
                         "on this system")
    frames = np.ascontiguousarray(frames, np.int16)
    if frames.ndim == 1:
        frames = frames[:, None]
    n, ch = frames.shape
    if ch != nchannels:
        raise CodecError(f"frame array has {ch} channels, "
                         f"caller says {nchannels}")
    vi = ctypes.create_string_buffer(ctypes.sizeof(_VorbisInfo) + 64)
    vc = ctypes.create_string_buffer(256)
    vd = ctypes.create_string_buffer(_DSP_SIZE)
    vb = ctypes.create_string_buffer(_BLOCK_SIZE)
    os_ = ctypes.create_string_buffer(_STREAM_SIZE)
    vor.vorbis_info_init.argtypes = [c_void_p]
    vor.vorbis_info_init(vi)
    out = bytearray()
    live = {"vc": False, "vd": False, "vb": False, "os": False}
    try:
        venc.vorbis_encode_init_vbr.argtypes = [c_void_p, c_long, c_long,
                                                c_float]
        venc.vorbis_encode_init_vbr.restype = c_int
        if venc.vorbis_encode_init_vbr(vi, ch, samplerate,
                                       float(quality)) != 0:
            raise CodecError(f"vorbis rejected {samplerate} Hz/{ch}ch/"
                             f"q={quality}")
        vor.vorbis_comment_init.argtypes = [c_void_p]
        vor.vorbis_comment_init(vc)
        live["vc"] = True
        vor.vorbis_analysis_init.argtypes = [c_void_p, c_void_p]
        if vor.vorbis_analysis_init(vd, vi) != 0:
            raise CodecError("vorbis_analysis_init failed")
        live["vd"] = True
        vor.vorbis_block_init.argtypes = [c_void_p, c_void_p]
        vor.vorbis_block_init(vd, vb)
        live["vb"] = True
        ogg.ogg_stream_init.argtypes = [c_void_p, c_int]
        ogg.ogg_stream_init(os_, 0x5459)
        live["os"] = True

        og = _OggPage()
        op = _OggPacket()
        ogg.ogg_stream_packetin.argtypes = [c_void_p, c_void_p]
        ogg.ogg_stream_flush.argtypes = [c_void_p, POINTER(_OggPage)]
        ogg.ogg_stream_flush.restype = c_int
        ogg.ogg_stream_pageout.argtypes = [c_void_p, POINTER(_OggPage)]
        ogg.ogg_stream_pageout.restype = c_int

        def _page_bytes(pg: _OggPage) -> bytes:
            return (ctypes.string_at(pg.header, pg.header_len)
                    + ctypes.string_at(pg.body, pg.body_len))

        h1, h2, h3 = _OggPacket(), _OggPacket(), _OggPacket()
        vor.vorbis_analysis_headerout.argtypes = [c_void_p] * 5
        if vor.vorbis_analysis_headerout(vd, vc, byref(h1), byref(h2),
                                         byref(h3)) != 0:
            raise CodecError("vorbis_analysis_headerout failed")
        for hp in (h1, h2, h3):
            ogg.ogg_stream_packetin(os_, byref(hp))
        while ogg.ogg_stream_flush(os_, byref(og)):
            out += _page_bytes(og)

        vor.vorbis_analysis_buffer.argtypes = [c_void_p, c_int]
        vor.vorbis_analysis_buffer.restype = POINTER(POINTER(c_float))
        vor.vorbis_analysis_wrote.argtypes = [c_void_p, c_int]
        vor.vorbis_analysis_blockout.argtypes = [c_void_p, c_void_p]
        vor.vorbis_analysis_blockout.restype = c_int
        vor.vorbis_analysis.argtypes = [c_void_p, c_void_p]
        vor.vorbis_bitrate_addblock.argtypes = [c_void_p]
        vor.vorbis_bitrate_flushpacket.argtypes = [c_void_p, c_void_p]
        vor.vorbis_bitrate_flushpacket.restype = c_int

        def _drain() -> None:
            while vor.vorbis_analysis_blockout(vd, vb) == 1:
                vor.vorbis_analysis(vb, None)
                vor.vorbis_bitrate_addblock(vb)
                while vor.vorbis_bitrate_flushpacket(vd, byref(op)) == 1:
                    ogg.ogg_stream_packetin(os_, byref(op))
                    while ogg.ogg_stream_pageout(os_, byref(og)):
                        out.extend(_page_bytes(og))

        fdata = frames.astype(np.float32) / 32768.0
        block = 4096
        for i in range(0, n, block):
            seg = fdata[i:i + block]
            pcm = vor.vorbis_analysis_buffer(vd, len(seg))
            for c in range(ch):
                col = np.ascontiguousarray(seg[:, c])
                ctypes.memmove(pcm[c], col.ctypes.data, col.nbytes)
            vor.vorbis_analysis_wrote(vd, len(seg))
            _drain()
        vor.vorbis_analysis_wrote(vd, 0)       # end-of-stream marker
        _drain()
        while ogg.ogg_stream_flush(os_, byref(og)):
            out += _page_bytes(og)
    finally:
        if live["os"]:
            ogg.ogg_stream_clear.argtypes = [c_void_p]
            ogg.ogg_stream_clear(os_)
        if live["vb"]:
            vor.vorbis_block_clear.argtypes = [c_void_p]
            vor.vorbis_block_clear(vb)
        if live["vd"]:
            vor.vorbis_dsp_clear.argtypes = [c_void_p]
            vor.vorbis_dsp_clear(vd)
        if live["vc"]:
            vor.vorbis_comment_clear.argtypes = [c_void_p]
            vor.vorbis_comment_clear(vc)
        vor.vorbis_info_clear.argtypes = [c_void_p]
        vor.vorbis_info_clear(vi)
    _write_bytes(file, bytes(out))
