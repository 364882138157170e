"""Host I/O runtime: video decode/encode, image and geo-asset loading.

Codecs cannot run on a TPU; this layer owns the host<->device boundary. The
decode path is a native C++ FFmpeg wrapper (geotrax_tpu/io/native) with a
cv2 fallback, feeding frames through a prefetch ring so device compute never
waits on the demuxer.
"""
