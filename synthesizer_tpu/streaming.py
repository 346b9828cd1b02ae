"""Streaming layer: decode, chunked sample streams, realtime stream mixing.

Rebuild of ``synthplayer/streaming.py`` (SURVEY.md §3.1 row 7, §4.4):

* ``AudiofileToWavStream`` — decode any audio file to a PCM WAV pipe.  WAV
  (and raw PCM) files stream natively; AIFF/AIFF-C, Sun AU, FLAC, and
  compressed WAV codecs (G.711 u-law/A-law, IMA ADPCM, IEEE float) decode
  IN-PROCESS (utils.decoders / utils.flac — no external binary needed);
  mp3/mp2 and Ogg Vorbis decode in-process too via ctypes bindings of the
  system codec libraries when present (utils.codecs — libmpg123 /
  libvorbisfile); only the remaining formats (opus/aac/...) spawn an
  ffmpeg (or oggdec) subprocess when the binary exists.
* ``SampleStream`` — iterate a WAV stream as fixed-size device Samples.
* ``EndlessFramesFilter`` — pad a finished stream with endless silence.
* ``VolumeFilter`` — per-stream volume (device amplify per chunk).
* ``StreamMixer`` — mix N live streams into timestamped chunks in realtime
  (the jukebox crossfade engine); chunk addition runs on device.
"""

from __future__ import annotations

import io
import json
import os
import shutil
import subprocess
import wave
from typing import BinaryIO, Iterator, List, Optional, Tuple, Union

import numpy as np

from . import params
from .sample import Sample

__all__ = ["AudiofileToWavStream", "SampleStream", "EndlessFramesFilter",
           "VolumeFilter", "RateConvertFilter", "StreamMixer", "StreamingError"]


class StreamingError(Exception):
    pass


def _ffmpeg_path() -> Optional[str]:
    return shutil.which("ffmpeg")


def _ffprobe_path() -> Optional[str]:
    return shutil.which("ffprobe")


def _oggdec_path() -> Optional[str]:
    return shutil.which("oggdec")


class AudiofileToWavStream(io.RawIOBase):
    """Read any audio file as a WAV stream of normalized PCM.

    WAV files in the target format pass through; other WAVs are converted
    in-memory (via Sample); everything else is piped through ffmpeg/oggdec
    when present (``ffprobe_info`` exposes the probe result).
    """

    def __init__(self, filename: str, samplerate: int = 0, nchannels: int = 0,
                 samplewidth: int = 0, hqresample: bool = True,
                 startfrom: float = 0.0, duration: float = 0.0):
        super().__init__()
        self.filename = filename
        self.samplerate = samplerate or params.norm_samplerate
        self.nchannels = nchannels or params.norm_nchannels
        self.samplewidth = samplewidth or params.norm_samplewidth
        self.hqresample = hqresample
        self.startfrom = startfrom
        self.duration = duration
        self._stream: Optional[BinaryIO] = None
        self._proc: Optional[subprocess.Popen] = None
        self.format_probe = None
        lower = filename.lower()
        if lower.endswith((".wav", ".wave")):
            self._open_wav()
        elif lower.endswith((".aif", ".aiff", ".aifc", ".au", ".snd",
                             ".flac", ".mp3", ".mp2", ".ogg", ".oga",
                             ".opus", ".mod", ".xm", ".it", ".s3m",
                             ".mptm", ".m4a", ".aac", ".mp4", ".wma",
                             ".mka", ".webm")):
            # spec-stable formats decode in-process (no ffmpeg needed);
            # mp3/ogg decode in-process too when the system codec
            # libraries exist (utils.codecs ctypes bindings), and
            # m4a/aac/wma/mka via the libav catch-all shim; files every
            # in-process rung rejects (damaged frames, missing libs)
            # still get ffmpeg when it exists
            try:
                self._open_host_decoder()
            except StreamingError:
                # keep the specific in-process error unless a subprocess
                # rung (ffmpeg, or oggdec for .ogg) can still try
                if _ffmpeg_path() is None and not (
                        lower.endswith((".ogg", ".oga"))
                        and _oggdec_path() is not None):
                    raise
                self._open_ffmpeg()
        else:
            self._open_ffmpeg()

    def _target_format_ok(self, w: wave.Wave_read) -> bool:
        return (w.getframerate() == self.samplerate
                and w.getnchannels() == self.nchannels
                and w.getsampwidth() == self.samplewidth
                and not self.startfrom and not self.duration)

    def _open_wav(self) -> None:
        try:
            with wave.open(self.filename, "rb") as w:
                ok = self._target_format_ok(w)
        except (wave.Error, EOFError):
            # compressed WAV (u-law/A-law/IMA-ADPCM/float): in-process
            self._open_host_decoder()
            return
        if ok:
            self._stream = open(self.filename, "rb")
            return
        # normalize via the device Sample pipeline, emit an in-memory WAV
        self._stream = self._normalized_wav(Sample(wave_file=self.filename))

    def _open_host_decoder(self) -> None:
        """Decode AIFF/AU/compressed-WAV/mp3/ogg/opus with the
        in-process parsers (utils.decoders), then normalize through the
        same device pipeline every other rung uses."""
        from .utils.decoders import DecodeError, decode_audio_file
        try:
            frames, rate, width, nch = decode_audio_file(self.filename)
        except DecodeError as e:
            raise StreamingError(str(e)) from e
        hq_pending = False
        if (self.hqresample and rate != self.samplerate and width == 2
                and self._lossy_source()):
            # the reference's hqresample flag (ffmpeg swr quality) maps
            # to soxr for lossy music sources; the audioop-contract
            # formats below keep the bit-exact device ratecv
            from .utils.soxr import SoxrError, have_soxr, soxr_resample
            if have_soxr():
                try:
                    frames = soxr_resample(frames, rate, self.samplerate)
                    rate = self.samplerate
                except SoxrError:
                    pass               # fall back to the device paths
            if rate != self.samplerate:
                # no libsoxr on this host: our own windowed-sinc device
                # resampler is the hq rung (same ~80 dB stopband class)
                hq_pending = True
        smp = Sample.from_raw_frames(
            np.ascontiguousarray(frames).tobytes(), width, rate, nch)
        if hq_pending:
            # Deliberately resample BEFORE _normalized_wav's startfrom/
            # duration clip (for soxr above likewise): clipping first
            # would feed the windowed-sinc filter zero-padding where the
            # clip boundary has real neighboring audio (audible edge
            # ringing against silence instead of the true signal), and
            # the exact clip must happen in TARGET-rate frames
            # (int(seconds*samplerate) at the point of use — never
            # round-trip a frame offset through seconds, CLAUDE.md).
            # Cost: sinc work on frames outside the clip window.
            try:
                smp.resample(self.samplerate, quality="hq")
            except ValueError:
                pass           # pathological ratio: exact linear ratecv
        self._stream = self._normalized_wav(smp)

    def _lossy_source(self) -> bool:
        """mp3/ogg/opus/aac/wma/mka by magic (these came through a lossy
        codec, so the exact-ratecv numeric contract does not apply)."""
        from .utils.codecs import looks_like_mpeg, looks_like_ogg
        try:
            with open(self.filename, "rb") as f:
                magic = f.read(12)
        except OSError:
            return False
        if looks_like_mpeg(magic) or looks_like_ogg(magic):
            return True
        if magic[4:8] == b"ftyp":                  # MP4 family (m4a)
            return True
        if (len(magic) >= 2 and magic[0] == 0xFF
                and (magic[1] & 0xF6) == 0xF0):    # ADTS AAC
            return True
        return magic[:4] in (b"\x30\x26\xb2\x75",  # ASF (wma)
                             b"\x1a\x45\xdf\xa3")  # EBML (mka/webm)

    def _normalized_wav(self, smp: Sample) -> io.BytesIO:
        """Clip/resample/width/channel-convert a decoded Sample to the
        target stream format -> in-memory WAV (shared by the WAV-convert
        and oggdec decode rungs — one pipeline, one set of semantics)."""
        if self.startfrom or self.duration:
            end = (self.startfrom + self.duration) if self.duration else smp.duration
            smp.clip(self.startfrom, end)
        smp.resample(self.samplerate)
        if self.samplewidth != smp.samplewidth:
            if self.samplewidth == 2:
                smp.make_16bit(maximize_amplitude=False)
            else:
                smp.make_32bit(scale_amplitude=True)
        if self.nchannels == 2:
            smp.stereo()
        elif self.nchannels == 1 and smp.nchannels == 2:
            smp.mono()
        bio = io.BytesIO()
        smp.write_wav(bio)
        bio.seek(0)
        return bio

    def _open_ffmpeg(self) -> None:
        ffmpeg = _ffmpeg_path()
        if ffmpeg is None:
            if (self.filename.lower().endswith(".ogg")
                    and _oggdec_path() is not None):
                self._open_oggdec()
                return
            from .utils.decoders import DecodeError
            try:
                # magic-sniffing catches misnamed wav/aiff/au files
                self._open_host_decoder()
                return
            except (StreamingError, DecodeError, OSError):
                pass
            raise StreamingError(
                f"cannot decode {self.filename!r}: no ffmpeg available "
                "and no in-process decoder recognizes it")
        if _ffprobe_path():
            try:
                out = subprocess.run(
                    [_ffprobe_path(), "-v", "quiet", "-print_format", "json",
                     "-show_format", "-show_streams", self.filename],
                    capture_output=True, check=True).stdout
                self.format_probe = json.loads(out)
            except Exception:
                self.format_probe = None
        codec = {1: "pcm_u8", 2: "pcm_s16le", 4: "pcm_s32le"}[self.samplewidth]
        cmd = [ffmpeg, "-v", "quiet"]
        if self.startfrom:
            cmd += ["-ss", str(self.startfrom)]
        cmd += ["-i", self.filename]
        if self.duration:
            cmd += ["-t", str(self.duration)]
        if self.hqresample:
            # the reference's hqresample flag: raise the swr resampler's
            # filter quality (always built into ffmpeg, unlike soxr).
            # WAV-path conversions use the exact audioop-semantics device
            # ratecv regardless of this flag.
            cmd += ["-af",
                    f"aresample=osr={self.samplerate}:filter_size=64:cutoff=0.95"]
        cmd += ["-ar", str(self.samplerate), "-ac", str(self.nchannels),
                "-acodec", codec, "-f", "wav", "-"]
        self._proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
        self._stream = self._proc.stdout

    def _open_oggdec(self) -> None:
        """ffmpeg-less .ogg fallback (the reference's oggdec ladder rung):
        oggdec can only emit the source rate/width to stdout, so the
        decoded WAV is normalized in-memory through the Sample pipeline."""
        proc = subprocess.run([_oggdec_path(), "-Q", "-o", "-", self.filename],
                              capture_output=True)
        if proc.returncode != 0 or not proc.stdout[:4] == b"RIFF":
            raise StreamingError(
                f"oggdec failed to decode {self.filename!r}")
        bio = io.BytesIO(proc.stdout)
        with wave.open(bio, "rb") as w:
            frames = w.readframes(w.getnframes())
            smp = Sample.from_raw_frames(frames, w.getsampwidth(),
                                         w.getframerate(), w.getnchannels())
        self._stream = self._normalized_wav(smp)

    def read(self, size: int = -1) -> bytes:
        return self._stream.read(size)

    def readable(self) -> bool:
        return True

    def close(self) -> None:
        if self._stream is not None:
            self._stream.close()
        if self._proc is not None:
            self._proc.terminate()
            self._proc.wait()
        super().close()


class SampleStream:
    """Iterate a WAV stream (or file) as fixed-size Samples.

    The WAV header is parsed once; chunks become device-resident Samples.
    """

    def __init__(self, wav_stream: Union[str, BinaryIO, AudiofileToWavStream],
                 frames_per_chunk: int = 0):
        self.frames_per_chunk = frames_per_chunk or params.norm_frames_per_chunk
        self._own = isinstance(wav_stream, str)
        self._wav = wave.open(wav_stream, "rb")
        self.samplerate = self._wav.getframerate()
        self.nchannels = self._wav.getnchannels()
        self.samplewidth = self._wav.getsampwidth()

    def __iter__(self) -> Iterator[Sample]:
        return self

    def __next__(self) -> Sample:
        frames = self._wav.readframes(self.frames_per_chunk)
        if not frames:
            raise StopIteration
        return Sample.from_raw_frames(frames, self.samplewidth,
                                      self.samplerate, self.nchannels)

    def close(self) -> None:
        self._wav.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class EndlessFramesFilter:
    """Wrap a sample stream so it yields silence chunks forever after the
    source ends (keeps StreamMixer timing alive)."""

    def __init__(self, stream: Iterator[Sample], frames_per_chunk: int = 0,
                 samplerate: int = 0, nchannels: int = 0, samplewidth: int = 0):
        self.stream = stream
        self.frames_per_chunk = frames_per_chunk or params.norm_frames_per_chunk
        self.samplerate = samplerate or getattr(stream, "samplerate", params.norm_samplerate)
        self.nchannels = nchannels or getattr(stream, "nchannels", params.norm_nchannels)
        self.samplewidth = samplewidth or getattr(stream, "samplewidth", params.norm_samplewidth)
        self._ended = False

    def __iter__(self):
        return self

    def __next__(self) -> Sample:
        if not self._ended:
            try:
                return next(self.stream)
            except StopIteration:
                self._ended = True
        n = self.frames_per_chunk * self.nchannels
        silence = np.zeros(n, dtype={1: np.int8, 2: np.int16, 4: np.int32}[self.samplewidth])
        return Sample.from_raw_frames(silence.tobytes(), self.samplewidth,
                                      self.samplerate, self.nchannels)


class VolumeFilter:
    """Per-stream volume: device amplify on every chunk."""

    def __init__(self, stream: Iterator[Sample], volume: float = 1.0):
        self.stream = stream
        self.volume = volume

    def __iter__(self):
        return self

    def __next__(self) -> Sample:
        return next(self.stream).amplify(self.volume)


class RateConvertFilter:
    """Live rate conversion of a sample stream, device-resident.

    Wraps a chunked stream and emits the same audio at ``target_rate``:
    quality='linear' (default) is the exact stateful ratecv
    (``ops.resample.StreamingResampler``, bit-exact to audioop);
    quality='hq' is the windowed-sinc polyphase twin
    (``ops.resample.StreamingHQResampler``, <= 1 LSB of the f64 oracle at
    any chunking — ``Sample.resample(quality='hq')``'s streaming form,
    including the end-of-stream flush of the filter tail).  Either way
    the carry stays on device and the host tracks only the integer
    output phase, so no per-chunk host<->device sync is introduced.
    Output chunk sizes vary (the rate ratio dictates what each input
    chunk completes).
    """

    def __init__(self, stream: Iterator[Sample], target_rate: int,
                 quality: str = "linear"):
        from .ops.resample import StreamingHQResampler, StreamingResampler
        if quality not in ("linear", "hq"):
            raise ValueError(f"unknown resample quality {quality!r}")
        self.stream = stream
        self.target_rate = target_rate
        self._rs: Optional[object] = None
        self._make = StreamingHQResampler if quality == "hq" \
            else StreamingResampler
        self._hq = quality == "hq"
        self._meta: Optional[tuple] = None
        self._done = False
        self._pending: Optional[Sample] = None      # output queued behind a tail
        self._pending_in: Optional[Sample] = None   # input requeued at a format change
        self._src_sig: Optional[tuple] = None       # (rate, width, nch) of _rs

    def __iter__(self):
        return self

    def _flush_tail(self) -> Optional[Sample]:
        """Drain the active hq resampler's buffered filter tail (linear
        has no buffered output — its carry never withholds rows)."""
        if self._hq and self._rs is not None:
            y, n = self._rs.flush()
            if n:
                width, nch, name = self._meta
                return Sample.from_jax(y, self.target_rate, width, name)
        return None

    def __next__(self) -> Sample:
        while True:
            if self._pending is not None:
                out, self._pending = self._pending, None
                return out
            if self._done:
                raise StopIteration
            if self._pending_in is not None:
                chunk, self._pending_in = self._pending_in, None
            else:
                try:
                    chunk = next(self.stream)
                except StopIteration:
                    self._done = True
                    tail = self._flush_tail()
                    if tail is not None:
                        return tail
                    raise
            sig = (chunk.samplerate, chunk.samplewidth, chunk.nchannels)
            if self._rs is not None and sig != self._src_sig:
                # mid-stream format change (ANY new rate/width/channels,
                # not only a change to the target rate): flush the active
                # resampler's buffered tail FIRST so a mixed-rate source
                # stays temporally ordered, retire the resampler, and
                # requeue the chunk — the next pass starts a fresh stream
                # segment built for ITS format (pushing it through the
                # old L/M would play it at the wrong pitch)
                tail = self._flush_tail()
                self._rs = None
                self._meta = None
                self._pending_in = chunk
                if tail is not None:
                    return tail
                continue
            if chunk.samplerate == self.target_rate:
                return chunk
            if self._rs is None:
                import jax.numpy as jnp
                dt = {1: jnp.int8, 2: jnp.int16,
                      4: jnp.int32}[chunk.samplewidth]
                self._rs = self._make(chunk.samplerate, self.target_rate,
                                      nchannels=chunk.nchannels, dtype=dt)
                self._meta = (chunk.samplewidth, chunk.nchannels, chunk.name)
                self._src_sig = sig
            y, n = self._rs.push(chunk.jax_frames)
            if self._hq:
                if n == 0:
                    continue          # window not yet full — pull more
                return Sample.from_jax(y, self.target_rate,
                                       chunk.samplewidth, chunk.name)
            return Sample.from_jax(y[:n], self.target_rate,
                                   chunk.samplewidth, chunk.name)


class StreamMixer:
    """Mix N live sample streams into timestamped chunks in realtime.

    Yields ``(timestamp_seconds, Sample)`` tuples; streams can be added and
    removed while running (two-deck crossfading, SURVEY.md §4.4).  All
    stream chunks must share the normalized format.
    """

    def __init__(self, streams: List[Iterator[Sample]] = (),
                 endless: bool = False, samplerate: int = 0, nchannels: int = 0,
                 samplewidth: int = 0, frames_per_chunk: int = 0):
        self.samplerate = samplerate or params.norm_samplerate
        self.nchannels = nchannels or params.norm_nchannels
        self.samplewidth = samplewidth or params.norm_samplewidth
        self.frames_per_chunk = frames_per_chunk or params.norm_frames_per_chunk
        self.endless = endless
        self.timestamp = 0.0
        self._streams: List[Iterator[Sample]] = []
        for s in streams:
            self.add_stream(s)

    def add_stream(self, stream: Iterator[Sample], endless: bool = False):
        if endless:
            stream = EndlessFramesFilter(stream, self.frames_per_chunk,
                                         self.samplerate, self.nchannels,
                                         self.samplewidth)
        self._streams.append(stream)
        return stream

    def remove_stream(self, stream) -> None:
        if stream in self._streams:
            self._streams.remove(stream)

    def close(self) -> None:
        for s in list(self._streams):
            closer = getattr(s, "close", None)
            if closer:
                closer()
        self._streams.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self) -> Iterator[Tuple[float, Sample]]:
        chunk_dur = self.frames_per_chunk / self.samplerate
        while self.endless or self._streams:
            mixed: Optional[Sample] = None
            for stream in list(self._streams):
                try:
                    chunk = next(stream)
                except StopIteration:
                    self.remove_stream(stream)
                    continue
                if chunk.nframes < self.frames_per_chunk:
                    chunk.add_silence(
                        (self.frames_per_chunk - chunk.nframes) / self.samplerate)
                if mixed is None:
                    mixed = chunk.copy()
                else:
                    mixed.mix(chunk)
            if mixed is None:
                z = np.zeros(self.frames_per_chunk * self.nchannels, np.int16)
                mixed = Sample.from_raw_frames(z.tobytes(), self.samplewidth,
                                               self.samplerate, self.nchannels)
            yield self.timestamp, mixed
            self.timestamp += chunk_dur
