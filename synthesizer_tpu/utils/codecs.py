"""In-process mp3 / Ogg Vorbis / Ogg Opus codecs via the system codec
libraries.

Closes the last "decode anything needs ffmpeg" dependency (SURVEY.md §3.1
row 7: the reference's AudiofileToWavStream decodes mp3/ogg through
miniaudio/ffmpeg — reference synthplayer/streaming.py): when the host has
the stock codec shared libraries (libmpg123, libvorbisfile, libopus;
encoders libmp3lame, libvorbisenc + libogg), we bind them directly with
ctypes — no subprocess, no python package, no copy of the codec.  For
Opus there is no libopusfile on this image, so the Ogg container layer
(demux AND mux, RFC 7845 granule/preskip rules) is implemented here on
top of libogg.  Every entry
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
                    c_int32, c_int64, c_long, c_size_t, c_ubyte, c_void_p)
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "CodecError", "have_mpg123", "have_lame", "have_vorbisfile",
    "have_vorbisenc", "have_opus", "read_mpeg", "probe_mpeg",
    "write_mp3", "read_vorbis", "probe_vorbis", "write_vorbis",
    "read_opus", "probe_opus", "write_opus",
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


def _opus():
    return _lib("opus", ("libopus.so.0", "libopus.so"))


def have_opus() -> bool:
    return _opus() is not None and _ogg() is not None


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


# ---------------------------------------------------------------------------
# Ogg Opus (libopus + our own libogg demux/mux — no libopusfile needed)
# ---------------------------------------------------------------------------

_SYNC_SIZE = 1024          # sizeof(ogg_sync_state) is ~32; opaque here
_OPUS_APPLICATION_AUDIO = 2049
_OPUS_SET_BITRATE = 4002
_OPUS_GET_LOOKAHEAD = 4027
_OPUS_MAX_FRAME = 5760     # 120 ms at 48 kHz, the decode buffer bound


def _ogg_demux(data: bytes, bos_magic: bytes):
    """Demux the first logical Ogg stream whose BOS packet starts with
    ``bos_magic`` -> (packets: list[bytes], packet_granules: list[int],
    final_granulepos).  Packets not ending a page carry granule -1."""
    ogg = _ogg()
    if ogg is None:
        raise CodecError("libogg is not available on this system")
    oy = ctypes.create_string_buffer(_SYNC_SIZE)
    os_ = ctypes.create_string_buffer(_STREAM_SIZE)
    ogg.ogg_sync_init.argtypes = [c_void_p]
    ogg.ogg_sync_init(oy)
    stream_live = False
    try:
        ogg.ogg_sync_buffer.argtypes = [c_void_p, c_long]
        ogg.ogg_sync_buffer.restype = c_void_p
        ogg.ogg_sync_wrote.argtypes = [c_void_p, c_long]
        ogg.ogg_sync_pageout.argtypes = [c_void_p, POINTER(_OggPage)]
        ogg.ogg_sync_pageout.restype = c_int
        ogg.ogg_page_serialno.argtypes = [POINTER(_OggPage)]
        ogg.ogg_page_serialno.restype = c_int
        ogg.ogg_page_bos.argtypes = [POINTER(_OggPage)]
        ogg.ogg_page_bos.restype = c_int
        ogg.ogg_page_granulepos.argtypes = [POINTER(_OggPage)]
        ogg.ogg_page_granulepos.restype = c_int64
        ogg.ogg_stream_init.argtypes = [c_void_p, c_int]
        ogg.ogg_stream_pagein.argtypes = [c_void_p, POINTER(_OggPage)]
        ogg.ogg_stream_packetout.argtypes = [c_void_p,
                                             POINTER(_OggPacket)]
        ogg.ogg_stream_packetout.restype = c_int
        ogg.ogg_stream_clear.argtypes = [c_void_p]

        buf = ogg.ogg_sync_buffer(oy, len(data))
        if not buf:
            raise CodecError("ogg_sync_buffer failed")
        ctypes.memmove(buf, data, len(data))
        ogg.ogg_sync_wrote(oy, len(data))

        og = _OggPage()
        op = _OggPacket()
        serial = None
        packets: list = []
        granules: list = []
        final_granule = -1
        while ogg.ogg_sync_pageout(oy, byref(og)) == 1:
            sn = ogg.ogg_page_serialno(byref(og))
            if serial is None:
                if not ogg.ogg_page_bos(byref(og)):
                    continue
                # peek this BOS page's first packet through a temp stream
                tmp = ctypes.create_string_buffer(_STREAM_SIZE)
                ogg.ogg_stream_init(tmp, sn)
                try:
                    ogg.ogg_stream_pagein(tmp, byref(og))
                    if (ogg.ogg_stream_packetout(tmp, byref(op)) != 1
                            or ctypes.string_at(op.packet,
                                                min(op.bytes, 8))
                            != bos_magic):
                        continue
                finally:
                    ogg.ogg_stream_clear(tmp)
                serial = sn
                ogg.ogg_stream_init(os_, sn)
                stream_live = True
                ogg.ogg_stream_pagein(os_, byref(og))
            elif sn == serial:
                ogg.ogg_stream_pagein(os_, byref(og))
            else:
                continue
            pg = ogg.ogg_page_granulepos(byref(og))
            if pg >= 0:
                final_granule = pg
            while ogg.ogg_stream_packetout(os_, byref(op)) == 1:
                packets.append(ctypes.string_at(op.packet, op.bytes))
                granules.append(int(op.granulepos))
        if serial is None:
            raise CodecError(
                f"no Ogg stream starting with {bos_magic!r}")
        return packets, granules, final_granule
    finally:
        if stream_live:
            ogg.ogg_stream_clear(os_)
        ogg.ogg_sync_clear.argtypes = [c_void_p]
        ogg.ogg_sync_clear(oy)


def _parse_opus_head(head: bytes):
    """OpusHead (RFC 7845 §5.1) -> (channels, preskip, input_rate,
    gain_q8db, family, streams, coupled, mapping)."""
    import struct
    if len(head) < 19 or head[:8] != b"OpusHead":
        raise CodecError("malformed OpusHead packet")
    version, ch = head[8], head[9]
    if version >> 4 != 0:
        raise CodecError(f"unsupported Opus version {version}")
    preskip, rate, gain = struct.unpack("<HIh", head[10:18])
    family = head[18]
    if family == 0:
        if ch not in (1, 2):
            raise CodecError(f"family-0 Opus with {ch} channels")
        streams, coupled, mapping = 1, ch - 1, bytes(range(ch))
    elif len(head) >= 21 + ch:
        streams, coupled = head[19], head[20]
        mapping = head[21:21 + ch]
    else:
        raise CodecError("truncated Opus channel mapping table")
    return ch, preskip, rate, gain, family, streams, coupled, mapping


def read_opus(filename: str) -> Tuple[np.ndarray, int, int, int]:
    """Decode an Ogg Opus file -> (frames [n, ch] int16, 48000, 2, nch).
    Our libogg demux feeds the raw libopus decoder (this host has no
    libopusfile); preskip/end-trim follow RFC 7845 granule rules, so an
    encode→decode round trip is sample-count exact."""
    opus = _opus()
    if opus is None:
        raise CodecError("libopus is not available on this system")
    with open(filename, "rb") as f:
        data = f.read()
    packets, _granules, final_granule = _ogg_demux(data, b"OpusHead")
    if len(packets) < 2:
        raise CodecError(f"no Opus audio packets in {filename!r}")
    (ch, preskip, _in_rate, gain, family, streams, coupled,
     mapping) = _parse_opus_head(packets[0])
    err = c_int(0)
    if family == 0:
        opus.opus_decoder_create.restype = c_void_p
        opus.opus_decoder_create.argtypes = [c_int, c_int,
                                             POINTER(c_int)]
        dec = opus.opus_decoder_create(48000, ch, byref(err))
        decode = opus.opus_decode
        destroy = opus.opus_decoder_destroy
    else:
        f_ = opus.opus_multistream_decoder_create
        f_.restype = c_void_p
        f_.argtypes = [c_int, c_int, c_int, c_int, c_char_p,
                       POINTER(c_int)]
        dec = f_(48000, ch, streams, coupled, bytes(mapping), byref(err))
        decode = opus.opus_multistream_decode
        destroy = opus.opus_multistream_decoder_destroy
    if err.value != 0 or not dec:
        raise CodecError(f"opus decoder create failed ({err.value})")
    decode.argtypes = [c_void_p, c_char_p, c_int, c_void_p, c_int, c_int]
    decode.restype = c_int
    destroy.argtypes = [c_void_p]
    try:
        pcm = np.empty((_OPUS_MAX_FRAME, ch), np.int16)
        chunks = []
        for pkt in packets[2:]:          # [0]=OpusHead [1]=OpusTags
            n = decode(dec, pkt, len(pkt), pcm.ctypes.data,
                       _OPUS_MAX_FRAME, 0)
            if n < 0:
                raise CodecError(f"opus_decode failed ({n})")
            chunks.append(pcm[:n].copy())
    finally:
        destroy(dec)
    if not chunks:
        raise CodecError(f"no Opus audio packets in {filename!r}")
    a = np.concatenate(chunks)
    # RFC 7845: drop preskip from the head; the final granulepos bounds
    # the real sample count (encoder padding trims off the tail)
    end = (final_granule - preskip if final_granule >= 0
           else len(a) - preskip)
    a = a[preskip:preskip + max(end, 0)]
    if gain:
        scale = 10.0 ** (gain / (20.0 * 256.0))
        a = np.clip(np.rint(a.astype(np.float64) * scale),
                    -32768, 32767).astype(np.int16)
    if not len(a):
        raise CodecError(f"empty Opus stream in {filename!r}")
    return a, 48000, 2, ch


def probe_opus(filename: str) -> Tuple[int, int, int]:
    """Header + page-walk probe -> (nframes, 48000, nch) from the final
    granulepos (no PCM synthesis)."""
    with open(filename, "rb") as f:
        data = f.read()
    packets, _granules, final_granule = _ogg_demux(data, b"OpusHead")
    if not packets:
        raise CodecError(f"no Opus stream in {filename!r}")
    ch, preskip, *_ = _parse_opus_head(packets[0])
    if final_granule < 0:
        raise CodecError(f"no granulepos in {filename!r}")
    return max(final_granule - preskip, 0), 48000, ch


def write_opus(file, frames: np.ndarray, samplerate: int,
               nchannels: int, bitrate: int = 128000) -> None:
    """Encode int16 frames [n, ch] to Ogg Opus (``bitrate`` bits/s).
    Opus encodes only at 8/12/16/24/48 kHz — callers with other rates
    resample first (Sample.write_opus does).  The stream carries exact
    preskip/end-trim granules, so decode recovers the sample count."""
    import struct as _struct
    opus, ogg = _opus(), _ogg()
    if opus is None or ogg is None:
        raise CodecError("libopus/libogg are not available "
                         "on this system")
    if samplerate not in (8000, 12000, 16000, 24000, 48000):
        raise CodecError(f"opus encodes at 8/12/16/24/48 kHz, "
                         f"not {samplerate}")
    frames = np.ascontiguousarray(frames, np.int16)
    if frames.ndim == 1:
        frames = frames[:, None]
    n, ch = frames.shape
    if ch != nchannels:
        raise CodecError(f"frame array has {ch} channels, "
                         f"caller says {nchannels}")
    if ch not in (1, 2):
        raise CodecError(f"family-0 Opus writes 1 or 2 channels, "
                         f"got {ch}")
    err = c_int(0)
    opus.opus_encoder_create.restype = c_void_p
    opus.opus_encoder_create.argtypes = [c_int, c_int, c_int,
                                         POINTER(c_int)]
    enc = opus.opus_encoder_create(samplerate, ch,
                                   _OPUS_APPLICATION_AUDIO, byref(err))
    if err.value != 0 or not enc:
        raise CodecError(f"opus encoder create failed ({err.value})")
    out = bytearray()
    os_ = ctypes.create_string_buffer(_STREAM_SIZE)
    stream_live = False
    try:
        opus.opus_encoder_ctl(c_void_p(enc), c_int(_OPUS_SET_BITRATE),
                              c_int(bitrate))
        look = c_int(0)
        opus.opus_encoder_ctl(c_void_p(enc), c_int(_OPUS_GET_LOOKAHEAD),
                              byref(look))
        to48 = 48000 // samplerate
        preskip48 = look.value * to48
        ogg.ogg_stream_init.argtypes = [c_void_p, c_int]
        ogg.ogg_stream_init(os_, 0x4F50)
        stream_live = True
        ogg.ogg_stream_packetin.argtypes = [c_void_p, c_void_p]
        ogg.ogg_stream_flush.argtypes = [c_void_p, POINTER(_OggPage)]
        ogg.ogg_stream_flush.restype = c_int
        ogg.ogg_stream_pageout.argtypes = [c_void_p, POINTER(_OggPage)]
        ogg.ogg_stream_pageout.restype = c_int
        og = _OggPage()

        def _page_bytes(pg: _OggPage) -> bytes:
            return (ctypes.string_at(pg.header, pg.header_len)
                    + ctypes.string_at(pg.body, pg.body_len))

        def _packetin(payload: bytes, granule: int, packetno: int,
                      bos: bool = False, eos: bool = False) -> None:
            buf = ctypes.create_string_buffer(payload, len(payload))
            pkt = _OggPacket(
                ctypes.cast(buf, POINTER(c_ubyte)), len(payload),
                int(bos), int(eos), granule, packetno)
            ogg.ogg_stream_packetin(os_, byref(pkt))

        head = (b"OpusHead" + bytes([1, ch])
                + _struct.pack("<HIh", preskip48, samplerate, 0)
                + bytes([0]))
        _packetin(head, 0, 0, bos=True)
        while ogg.ogg_stream_flush(os_, byref(og)):
            out += _page_bytes(og)
        vendor = b"synthesizer_tpu"
        tags = (b"OpusTags" + _struct.pack("<I", len(vendor)) + vendor
                + _struct.pack("<I", 0))
        _packetin(tags, 0, 1)
        while ogg.ogg_stream_flush(os_, byref(og)):
            out += _page_bytes(og)

        opus.opus_encode.argtypes = [c_void_p, c_void_p, c_int,
                                     c_void_p, c_int32]
        opus.opus_encode.restype = c_int32
        pktbuf = ctypes.create_string_buffer(1 << 14)
        fsize = samplerate // 50                      # 20 ms frames
        total48 = n * to48
        # RFC 7845 §4: the decoder discards preskip samples up front, so
        # the encoder must run PAST the input by at least the lookahead
        # (zero padding; the final granulepos trims it on decode)
        target = n + look.value
        packetno = 2
        pos = 0
        while pos < target:
            seg = frames[pos:pos + fsize]
            if len(seg) < fsize:                      # zero-pad the tail
                seg = np.concatenate(
                    [seg, np.zeros((fsize - len(seg), ch), np.int16)])
            seg = np.ascontiguousarray(seg)
            nb = opus.opus_encode(enc, seg.ctypes.data, fsize, pktbuf,
                                  len(pktbuf))
            if nb < 0:
                raise CodecError(f"opus_encode failed ({nb})")
            pos += fsize
            eos = pos >= target
            # granulepos caps at the REAL sample count on the last
            # packet so decoders trim the zero padding
            gran = preskip48 + min(pos * to48, total48)
            _packetin(pktbuf.raw[:nb], gran, packetno, eos=eos)
            packetno += 1
            while ogg.ogg_stream_pageout(os_, byref(og)):
                out.extend(_page_bytes(og))
        while ogg.ogg_stream_flush(os_, byref(og)):
            out += _page_bytes(og)
    finally:
        if stream_live:
            ogg.ogg_stream_clear.argtypes = [c_void_p]
            ogg.ogg_stream_clear(os_)
        opus.opus_encoder_destroy.argtypes = [c_void_p]
        opus.opus_encoder_destroy(enc)
    _write_bytes(file, bytes(out))
