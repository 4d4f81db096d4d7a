"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched pandas operators.

The Spark-side plumbing (schemas, batch iterator shape, partition
behavior) is real and tested.  The real-decode path is GENUINE for the
formats a stdlib+numpy environment can parse — 24-bit BMP images
(struct header + pixel-array math), the FULL static PNG format (REAL
compressed decode: chunk walk, stdlib-zlib DEFLATE inflate, all five
scanline unfilters, Adam7 interlace, palette/sub-byte/16-bit depths —
r9), GIF (full variable-width LZW,
four-pass interlace — r9), lossless WebP (full VP8L bitstream: prefix
codes, meta-groups, color cache, LZ77, all four inverse transforms —
r9, libwebp-conformance-tested both directions), ICO favicons (classic
32/24/8/4/1-bpp DIB entries + embedded PNG, largest-entry selection —
r9), baseline TIFF (IFD walk both byte orders, strips,
PackBits/Deflate/TIFF-LZW incl. early change, horizontal predictor,
bilevel/grey/palette/RGB — r9, two-way JDK-plugin conformance),
BASELINE JPEG (real marker
walk, canonical Huffman decode, dequant + IDCT, 4:2:0 upsampling,
restart markers; progressive SOF2 with spectral selection AND
successive approximation — DC/AC refinement scans, EOBRUN), PCM +
IMA-ADPCM WAV audio, native FLAC (real rice decode, fixed + LPC
prediction, mid/left/right-side stereo decorrelation), and YUV4MPEG2
(y4m) video (header parse + frame walk), Ogg Vorbis (real codebook /
floor1 / residue / IMDCT decode — new r9) — and library-gated for the
remaining compressed formats (arithmetic-coded DCT JPEG — SOF9/10 —
decodes for real since r9 via a T.81 Annex D/F coder, libjpeg-verified,
incl. the Adobe CMYK/YCCK/RGB colorspace variants):
lossless/differential JPEG (SOF3/5-7/11/13-15) needs PIL,
lossy WebP (VP8) and the VP8X extended container need PIL,
Ogg Opus needs soundfile, MP4 pixel decode needs av (container
metadata — unfragmented AND fragmented frame counts — is stdlib, as is
Ogg-FLAC via a real RFC 3533 depacketizer), none of which ship in this
container, so those rows raise NotImplementedError loudly (the probe + skip-marked test light
the seam up the moment the libraries appear).

PERMANENT-GATE RATIONALE (why the remaining gates stay gates rather
than r10 stdlib decoders): lossy WebP (VP8) is a full boolean-coder
video intra-frame — the same H.264-class machinery as MP4 pixels —
while the lossless half (VP8L) decodes above; Ogg Opus is SILK + CELT — two full
psychoacoustic codecs (LPC/LTP vocoder plus MDCT transform coder with
PVQ, ~15k lines in the reference libopus) whose conformance cannot be
established without the official test vectors; MP4 pixel decode is
H.264/H.265 (CABAC, inter-prediction, deblocking — an order of
magnitude beyond every codec here), and a crawl pipeline needs frame
COUNTS and sampling geometry (stdlib above) far more often than pixel
data; lossless/differential JPEG processes are effectively absent
from web crawls (medical/scientific archives only).  Each gate is
probed, loud, and exercised by tests, so nothing silently rots; the
cost/benefit deliberately stops here.  THE CODEC PROGRAM IS CLOSED
(r10): no new formats — the remaining gates above are permanent by
design, and future work on this package is maintenance only.  The
former single module is split one file per codec family (core /
codecs_image / codecs_webp / codecs_jpeg / codecs_jpeg_arith / audio /
codecs_vorbis / codecs_mp4); this __init__ re-exports every top-level
name the flat module defined, so callers and tests are unchanged.
Swapping in PIL/ffmpeg changes only the inner per-format branch, not
the Spark plan.

Design for 100 TB: binary payloads ride the DataFrame as parquet binary
columns (or references to object-store keys for >100 MB blobs);
`mapInPandas` keeps the data in Arrow record batches end to end, one
Python worker per core, and `maxRecordsPerBatch` bounds peak memory
(decode blow-up factor x batch size).  Feature extraction emits small
fixed-width arrays, so the shuffle after extraction is tiny relative to
the scan.
"""

from __future__ import annotations

from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.codecs_image import (
    _ADAM7,
    _PNG_CHANNELS,
    _PNG_DEPTHS,
    _decode_bmp,
    _decode_gif,
    _decode_ico,
    _decode_ico_dib,
    _decode_png,
    _decode_tiff,
    _gif_row_order,
    _lzw_decode,
    _lzw_encode,
    _png_pack_row,
    _png_unfilter,
    _png_unpack,
    _tiff_lzw_decode,
    _tiff_packbits_decode,
    make_bmp,
    make_gif,
    make_ico,
    make_png,
    make_tiff,
)

from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.codecs_webp import (
    _VP8L_CLC_ORDER,
    _VP8L_DIST_MAP,
    _Vp8lBitReader,
    _Vp8lBitWriter,
    _Vp8lCode,
    _decode_webp,
    _vp8l_decode_image,
    _vp8l_inverse_transform,
    _vp8l_prefix_value,
    _vp8l_read_code,
    make_webp,
)

from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.codecs_jpeg import (
    _DCT_MAT,
    _HUFF_AC_CHROMA,
    _HUFF_AC_FLAT,
    _HUFF_AC_LUMA,
    _HUFF_DC_CHROMA,
    _HUFF_DC_LUMA,
    _JpegBitReader,
    _JpegBitWriter,
    _QT_CHROMA,
    _QT_LUMA,
    _ZIGZAG,
    _block_ac_first,
    _block_ac_refine,
    _block_sequential,
    _dct_matrix,
    _decode_jpeg,
    _decode_jpeg_scan,
    _encode_block_ac_first,
    _encode_block_ac_refine,
    _flush_eobrun,
    _huff_decode_table,
    _huff_encode_table,
    _jpeg_decode_sym,
    _jpeg_extend,
    _mag_bits,
    _pad_to,
    _quantized_blocks,
    make_jpeg,
)

from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.codecs_jpeg_arith import (
    _ARITH_FIXED,
    _ARITH_QE,
    _ArithDecoder,
    _ArithEncoder,
    _arith_decode_ac,
    _arith_decode_ac_refine,
    _arith_decode_dc,
    _arith_encode_ac,
    _arith_encode_ac_refine,
    _arith_encode_dc,
    _decode_jpeg_scan_arith,
    _jpeg_any_marker,
    _jpeg_next_marker,
)

from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.audio import (
    _FLAC_BLOCKSIZES,
    _FlacBitReader,
    _FlacBitWriter,
    _IMA_INDEX,
    _IMA_STEPS,
    _crc16,
    _crc8,
    _decode_adpcm_wav,
    _decode_flac,
    _decode_ogg,
    _decode_wav,
    _decode_y4m,
    _encode_flac_subframe,
    _fixed_residual,
    _flac_stream_parts,
    _ima_step,
    _ogg_crc,
    _ogg_last_granule,
    _ogg_packets,
    _read_flac_residual,
    _read_flac_subframe,
    _utf8_coded,
    make_adpcm_wav,
    make_flac,
    make_ogg_flac,
    make_wav,
    make_y4m,
)

from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.codecs_vorbis import (
    _FLOOR1_RANGES,
    _VORBIS_COARSE_DELTA,
    _VORBIS_COARSE_LV,
    _VORBIS_DB,
    _VORBIS_FIX_BITS,
    _VORBIS_FIX_DELTA,
    _VORBIS_FIX_ENTRIES,
    _VORBIS_FIX_MIN,
    _VORBIS_FIX_N,
    _VorbisBits,
    _VorbisBitsW,
    _VorbisCodebook,
    _VorbisEOP,
    _decode_vorbis,
    _decode_vorbis_inner,
    _floor1_decode,
    _floor1_synthesize,
    _imdct_matrix,
    _parse_floor1,
    _parse_residue,
    _render_point,
    _residue_decode,
    _vilog,
    _vorbis_assign_codewords,
    _vorbis_couple_forward,
    _vorbis_db_table,
    _vorbis_float_pack,
    _vorbis_float_unpack,
    _vorbis_window_shape,
    make_ogg_vorbis,
)

from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.codecs_mp4 import (
    _mp4_box,
    _mp4_children,
    _mp4_find,
    _parse_mp4,
    make_mp4,
)

from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.core import (
    DECODED_QUARANTINE_SCHEMA,
    DECODED_SCHEMA,
    FEATURE_DIM,
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    STDLIB_FORMATS,
    _decode_one,
    _fake_decode,
    _real_decode,
    codec_support,
    decode_media,
    extract_features,
    sample_frames,
    synthesize_media,
    synthesize_real_media,
)

