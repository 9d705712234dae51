// Native frame-ingestion runtime: the host-side half of the IO pipeline.
//
// Role in the framework (SURVEY.md §7 step 6): the reference's frame source
// is the browser media stack (getUserMedia -> <video> -> canvas readbacks,
// client/src/core/camera.ts:1-29); in a TPU serving stack the equivalent is
// a native ingestion layer that accepts decoded frames from N streams,
// converts pixel formats (YUV420 -> RGB, the decode-to-tensor stage named
// in BASELINE.json), and assembles the freshest frame per stream into a
// contiguous [S, H, W, 3] batch buffer that jax.device_put can DMA without
// further copies.  Buffered by a ring of assembly buffers (depth 2 by
// default = classic double buffering; vst_pool_set_depth raises it so a
// fused-round scheduler can hold a whole rotation's group views live while
// the previous round is still in flight): assembly writes the next ring
// buffer while earlier batches are still being uploaded.
//
// Concurrency model: one producer thread per stream (lock-free SPSC slot
// ring per stream, seqlock-style), one consumer (the batch assembler).
// No mutexes on the hot path.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct StreamRing {
    // Triple-buffered slots per stream: producer writes round-robin,
    // consumer snapshots the latest complete slot.
    static constexpr int kSlots = 3;
    std::vector<uint8_t> data;          // kSlots * frame_bytes
    std::atomic<uint64_t> seq[kSlots];  // even = stable, odd = writing
    std::atomic<int> latest{-1};
    std::atomic<uint64_t> frame_id{0};
    std::atomic<uint64_t> consumed_id{0};
    std::atomic<uint64_t> drops{0};
};

struct Pool {
    int num_streams;
    int height;
    int width;
    int s2d_block = 0;   // 0 = natural [S,H,W,3] batches; b = space-to-depth
                         // packed [S,H/b,W/b,b*b*3] (the TPU ingestion
                         // layout, ops/layout.py -- patch order (dy,dx,c))
    size_t frame_bytes;  // H*W*3
    std::vector<StreamRing> rings;
    // ring of assembly output buffers: depth 2 (plain double buffering)
    // by default; a fused-round consumer that assembles G groups before
    // dispatching and collects one round late needs 2*G buffers so every
    // group's zero-copy view survives the full round in flight
    // (vst_pool_set_depth; runtime/scheduler.py step_round).
    int depth = 2;
    std::vector<std::vector<uint8_t>> batch;
    std::vector<std::vector<uint64_t>> batch_ids;
    int cur_batch = 0;
    // guide-lane emission (vst_pool_enable_lanes): per-patch tap offsets
    // (guide_s2d_sel planar order, ops/layout.py); during each stream's
    // s2d pack the assembler also writes lanes[k, s, i, j] =
    // packed[s, i, j, lane_sel[k]] -- the device-side guide gather's
    // frame re-read never happens (pipeline guide_source='host').
    std::vector<int32_t> lane_sel;
    std::vector<std::vector<uint8_t>> lanes;  // depth x (nl * S * (H/b) * (W/b))
};

// Pack one natural RGB frame into s2d patch order.  Runs inside the batch
// assembler's copy slot, replacing the plain memcpy: same bytes touched
// once, reads sequential per source row, writes strided by the patch size
// (b*b*3) -- the packing is effectively free next to the copy itself.
void pack_s2d(uint8_t* dst, const uint8_t* src, int H, int W, int b) {
    const int wp = W / b;
    const size_t patch = static_cast<size_t>(b) * b * 3;
    const size_t row15 = static_cast<size_t>(b) * 3;  // bytes per (row,patch)
    for (int i = 0; i < H / b; ++i) {
        uint8_t* orow = dst + static_cast<size_t>(i) * wp * patch;
        for (int dy = 0; dy < b; ++dy) {
            const uint8_t* srow =
                src + (static_cast<size_t>(i) * b + dy) * W * 3;
            uint8_t* o = orow + dy * row15;
            for (int j = 0; j < wp; ++j)
                std::memcpy(o + static_cast<size_t>(j) * patch,
                            srow + static_cast<size_t>(j) * row15, row15);
        }
    }
}

inline uint8_t clamp_u8(int v) {
    return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

}  // namespace

extern "C" {

// ---- pool lifecycle -------------------------------------------------------

// s2d_block: 0 = natural [S,H,W,3] batches; b > 0 = space-to-depth packed
// [S,H/b,W/b,b*b*3] (requires H, W divisible by b).
void* vst_pool_create_s2d(int num_streams, int height, int width,
                          int s2d_block) {
    Pool* p = new Pool();
    p->num_streams = num_streams;
    p->height = height;
    p->width = width;
    p->s2d_block = s2d_block;
    p->frame_bytes = static_cast<size_t>(height) * width * 3;
    p->rings = std::vector<StreamRing>(num_streams);
    for (auto& r : p->rings) {
        r.data.resize(StreamRing::kSlots * p->frame_bytes);
        for (int i = 0; i < StreamRing::kSlots; ++i) r.seq[i].store(0);
    }
    p->batch.resize(p->depth);
    p->batch_ids.resize(p->depth);
    p->lanes.resize(p->depth);
    for (int b = 0; b < p->depth; ++b) {
        p->batch[b].resize(static_cast<size_t>(num_streams) * p->frame_bytes);
        p->batch_ids[b].resize(num_streams, 0);
    }
    return p;
}

// Resize the assembly-buffer ring: views returned by the assemble calls
// stay valid for (depth - 1) subsequent assembles.  A scheduler that
// assembles G groups per fused round and keeps one round in flight needs
// depth = 2*G.  Invalidates any outstanding views.  Returns 0 on success.
int vst_pool_set_depth(void* pool, int depth) {
    Pool* p = static_cast<Pool*>(pool);
    if (depth < 2) return -1;
    p->depth = depth;
    p->batch.resize(depth);
    p->batch_ids.resize(depth);
    p->lanes.resize(depth);
    const size_t plane =
        p->s2d_block > 0
            ? static_cast<size_t>(p->height / p->s2d_block) *
                  (p->width / p->s2d_block)
            : 0;
    for (int b = 0; b < depth; ++b) {
        p->batch[b].resize(static_cast<size_t>(p->num_streams) * p->frame_bytes);
        p->batch_ids[b].resize(p->num_streams, 0);
        if (!p->lane_sel.empty())
            p->lanes[b].resize(p->lane_sel.size() * p->num_streams * plane);
    }
    p->cur_batch = 0;
    return 0;
}

void* vst_pool_create(int num_streams, int height, int width) {
    return vst_pool_create_s2d(num_streams, height, width, 0);
}

void vst_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// ---- producer side (one thread per stream) --------------------------------

// Push an RGB frame for stream `s`. Returns the frame id.
namespace {
inline void count_drop(StreamRing& r, uint64_t id) {
    // The slot being overwritten held frame (id - kSlots); if that frame
    // exists and was never consumed, it is lost: backpressure signal.
    if (id > StreamRing::kSlots) {
        uint64_t overwritten = id - StreamRing::kSlots;
        if (overwritten > r.consumed_id.load(std::memory_order_relaxed))
            r.drops.fetch_add(1, std::memory_order_relaxed);
    }
}
}  // namespace

uint64_t vst_push_rgb(void* pool, int s, const uint8_t* rgb) {
    Pool* p = static_cast<Pool*>(pool);
    StreamRing& r = p->rings[s];
    uint64_t id = r.frame_id.fetch_add(1, std::memory_order_relaxed) + 1;
    int slot = static_cast<int>(id % StreamRing::kSlots);
    count_drop(r, id);
    // seqlock write: mark busy (odd), copy, mark stable (even)
    uint64_t seq0 = r.seq[slot].load(std::memory_order_relaxed);
    r.seq[slot].store(seq0 + 1, std::memory_order_release);
    std::memcpy(r.data.data() + slot * p->frame_bytes, rgb, p->frame_bytes);
    r.seq[slot].store(seq0 + 2, std::memory_order_release);
    r.latest.store(slot, std::memory_order_release);
    return id;
}

// Push an I420 (YUV420 planar) frame; converted to RGB in place (BT.601).
// This is the "frame decode-to-tensor" stage: decoders emit YUV.
uint64_t vst_push_i420(void* pool, int s, const uint8_t* y, const uint8_t* u,
                       const uint8_t* v, int y_stride, int uv_stride) {
    Pool* p = static_cast<Pool*>(pool);
    StreamRing& r = p->rings[s];
    uint64_t id = r.frame_id.fetch_add(1, std::memory_order_relaxed) + 1;
    int slot = static_cast<int>(id % StreamRing::kSlots);
    count_drop(r, id);
    uint64_t seq0 = r.seq[slot].load(std::memory_order_relaxed);
    r.seq[slot].store(seq0 + 1, std::memory_order_release);

    uint8_t* dst = r.data.data() + slot * p->frame_bytes;
    const int W = p->width, H = p->height;
    for (int row = 0; row < H; ++row) {
        const uint8_t* yr = y + row * y_stride;
        const uint8_t* ur = u + (row / 2) * uv_stride;
        const uint8_t* vr = v + (row / 2) * uv_stride;
        uint8_t* out = dst + static_cast<size_t>(row) * W * 3;
        for (int col = 0; col < W; ++col) {
            int yy = (static_cast<int>(yr[col]) - 16) * 298;
            int uu = static_cast<int>(ur[col / 2]) - 128;
            int vv = static_cast<int>(vr[col / 2]) - 128;
            out[col * 3 + 0] = clamp_u8((yy + 409 * vv + 128) >> 8);
            out[col * 3 + 1] = clamp_u8((yy - 100 * uu - 208 * vv + 128) >> 8);
            out[col * 3 + 2] = clamp_u8((yy + 516 * uu + 128) >> 8);
        }
    }
    r.seq[slot].store(seq0 + 2, std::memory_order_release);
    r.latest.store(slot, std::memory_order_release);
    return id;
}

// ---- consumer side (batch assembler) --------------------------------------

// Assemble the freshest frame of every stream into the next ring buffer.
// Returns a pointer to a stable [S, H, W, 3] uint8 buffer (valid for the
// next depth-1 assemble calls on the same pool; depth defaults to 2 =
// double buffering, see vst_pool_set_depth).
// frame_ids_out (len S) receives the frame id captured per stream (0 if the
// stream never produced).
static void assemble_stream(Pool* p, int s, uint8_t* dst,
                            uint64_t* frame_id_out,
                            uint8_t* lanes_row = nullptr,
                            size_t lanes_kstride = 0) {
    StreamRing& r = p->rings[s];
    const int nl = static_cast<int>(p->lane_sel.size());
    const size_t plane =
        p->s2d_block > 0
            ? static_cast<size_t>(p->height / p->s2d_block) *
                  (p->width / p->s2d_block)
            : 0;
    int slot = r.latest.load(std::memory_order_acquire);
    if (slot < 0) {
        std::memset(dst, 0, p->frame_bytes);
        if (lanes_row)
            for (int k = 0; k < nl; ++k)
                std::memset(lanes_row + static_cast<size_t>(k) * lanes_kstride,
                            0, plane);
        if (frame_id_out) *frame_id_out = 0;
        return;
    }
    // seqlock read: retry while the producer is mid-write
    for (;;) {
        uint64_t s0 = r.seq[slot].load(std::memory_order_acquire);
        if (s0 & 1) { slot = r.latest.load(std::memory_order_acquire); continue; }
        const uint8_t* src = r.data.data() + slot * p->frame_bytes;
        if (p->s2d_block > 0)
            pack_s2d(dst, src, p->height, p->width, p->s2d_block);
        else
            std::memcpy(dst, src, p->frame_bytes);
        uint64_t s1 = r.seq[slot].load(std::memory_order_acquire);
        if (s0 == s1) break;  // stable snapshot
        slot = r.latest.load(std::memory_order_acquire);
    }
    if (lanes_row) {
        // emit the guide tap lanes off the just-packed patch vectors
        // (dst is our private buffer -- no seqlock concerns): each patch
        // is read once while hot in cache, nl plane writes stream out.
        const size_t patch =
            static_cast<size_t>(p->s2d_block) * p->s2d_block * 3;
        for (size_t pix = 0; pix < plane; ++pix) {
            const uint8_t* pv = dst + pix * patch;
            for (int k = 0; k < nl; ++k)
                lanes_row[static_cast<size_t>(k) * lanes_kstride + pix] =
                    pv[p->lane_sel[k]];
        }
    }
    uint64_t captured = r.frame_id.load(std::memory_order_relaxed);
    r.consumed_id.store(captured, std::memory_order_relaxed);
    if (frame_id_out) *frame_id_out = captured;
}

// Enable guide-lane emission on an s2d pool: sel holds nl per-patch tap
// offsets (< b*b*3, guide_s2d_sel planar order).  Subsequent assembles
// also fill a [nl, rows, H/b, W/b] uint8 lane tensor (vst_lanes_ptr).
// Returns 0 on success, -1 on a non-s2d pool / bad args.
int vst_pool_enable_lanes(void* pool, const int32_t* sel, int nl) {
    Pool* p = static_cast<Pool*>(pool);
    if (p->s2d_block <= 0 || nl <= 0 || !sel) return -1;
    const int lim = p->s2d_block * p->s2d_block * 3;
    for (int k = 0; k < nl; ++k)
        if (sel[k] < 0 || sel[k] >= lim) return -1;
    p->lane_sel.assign(sel, sel + nl);
    const size_t plane = static_cast<size_t>(p->height / p->s2d_block) *
                         (p->width / p->s2d_block);
    for (int b = 0; b < p->depth; ++b)
        p->lanes[b].resize(static_cast<size_t>(nl) * p->num_streams * plane);
    return 0;
}

// Lanes of the CURRENT batch (the one vst_assemble_batch/_range just
// returned): [nl, rows, H/b, W/b] uint8, rows = S (full) or end-begin
// (ranged, compact row stride).  Valid until the next assemble.
const uint8_t* vst_lanes_ptr(void* pool) {
    Pool* p = static_cast<Pool*>(pool);
    return p->lane_sel.empty() ? nullptr : p->lanes[p->cur_batch].data();
}

const uint8_t* vst_assemble_batch(void* pool, uint64_t* frame_ids_out) {
    Pool* p = static_cast<Pool*>(pool);
    int b = (p->cur_batch + 1) % p->depth;  // write the next ring buffer
    uint8_t* out = p->batch[b].data();
    const size_t plane =
        p->s2d_block > 0
            ? static_cast<size_t>(p->height / p->s2d_block) *
                  (p->width / p->s2d_block)
            : 0;
    uint8_t* lanes = p->lane_sel.empty() ? nullptr : p->lanes[b].data();
    const size_t kstride = static_cast<size_t>(p->num_streams) * plane;
    for (int s = 0; s < p->num_streams; ++s)
        assemble_stream(p, s, out + static_cast<size_t>(s) * p->frame_bytes,
                        frame_ids_out ? frame_ids_out + s : nullptr,
                        lanes ? lanes + static_cast<size_t>(s) * plane : nullptr,
                        kstride);
    p->cur_batch = b;
    return out;
}

// Ranged assemble for the group-scheduled latency mode: pack only streams
// [begin, end) into rows [0, end-begin) of the next batch buffer.  Avoids
// the full-batch memcpy/pack at groups x the base tick rate when each tick
// serves one group (runtime/scheduler.py groups>1).
const uint8_t* vst_assemble_range(void* pool, int begin, int end,
                                  uint64_t* frame_ids_out) {
    Pool* p = static_cast<Pool*>(pool);
    if (begin < 0 || end > p->num_streams || begin >= end) return nullptr;
    int b = (p->cur_batch + 1) % p->depth;
    uint8_t* out = p->batch[b].data();
    const size_t plane =
        p->s2d_block > 0
            ? static_cast<size_t>(p->height / p->s2d_block) *
                  (p->width / p->s2d_block)
            : 0;
    uint8_t* lanes = p->lane_sel.empty() ? nullptr : p->lanes[b].data();
    // compact row stride: the ranged lane tensor is [nl, end-begin, ...]
    const size_t kstride = static_cast<size_t>(end - begin) * plane;
    for (int s = begin; s < end; ++s)
        assemble_stream(p, s,
                        out + static_cast<size_t>(s - begin) * p->frame_bytes,
                        frame_ids_out ? frame_ids_out + (s - begin) : nullptr,
                        lanes ? lanes + static_cast<size_t>(s - begin) * plane
                              : nullptr,
                        kstride);
    p->cur_batch = b;
    return out;
}

uint64_t vst_stream_drops(void* pool, int s) {
    return static_cast<Pool*>(pool)->rings[s].drops.load(std::memory_order_relaxed);
}

// ---- output side: RGB -> I420 for the video-encoder handoff ---------------
// (BT.601 full-swing inverse of vst_push_i420's decode; the "output
// encode" stage of the IO pipeline, SURVEY.md §7 step 6.)
void vst_rgb_to_i420(const uint8_t* rgb, int width, int height,
                     uint8_t* y_out, uint8_t* u_out, uint8_t* v_out) {
    for (int r = 0; r < height; ++r) {
        const uint8_t* row = rgb + static_cast<size_t>(r) * width * 3;
        uint8_t* yr = y_out + static_cast<size_t>(r) * width;
        for (int c = 0; c < width; ++c) {
            int R = row[c * 3], G = row[c * 3 + 1], B = row[c * 3 + 2];
            yr[c] = clamp_u8(((66 * R + 129 * G + 25 * B + 128) >> 8) + 16);
        }
    }
    int hw = width / 2, hh = height / 2;
    for (int r = 0; r < hh; ++r) {
        uint8_t* ur = u_out + static_cast<size_t>(r) * hw;
        uint8_t* vr = v_out + static_cast<size_t>(r) * hw;
        for (int c = 0; c < hw; ++c) {
            // average the 2x2 block
            int R = 0, G = 0, B = 0;
            for (int dy = 0; dy < 2; ++dy) {
                const uint8_t* row =
                    rgb + static_cast<size_t>(2 * r + dy) * width * 3;
                for (int dx = 0; dx < 2; ++dx) {
                    R += row[(2 * c + dx) * 3];
                    G += row[(2 * c + dx) * 3 + 1];
                    B += row[(2 * c + dx) * 3 + 2];
                }
            }
            R /= 4; G /= 4; B /= 4;
            ur[c] = clamp_u8(((-38 * R - 74 * G + 112 * B + 128) >> 8) + 128);
            vr[c] = clamp_u8(((112 * R - 94 * G - 18 * B + 128) >> 8) + 128);
        }
    }
}

int vst_frame_bytes(void* pool) {
    return static_cast<int>(static_cast<Pool*>(pool)->frame_bytes);
}

// Packed-composite output -> I420: the device emits s2d-packed frames
// (ops/layout.py::alpha_composite_s2d keeps the whole composite in patch
// layout; reconstructing the natural layout ON DEVICE costs ~27 ms per
// 64-stream batch).  The encoder touches every byte anyway, so the unpack
// is free here: per output row, walk the b patches that contain it.
void vst_s2d_rgb_to_i420(const uint8_t* packed, int width, int height,
                         int block, uint8_t* y_out, uint8_t* u_out,
                         uint8_t* v_out) {
    const int b = block, wp = width / b;
    const size_t patch = static_cast<size_t>(b) * b * 3;
    const size_t prow = static_cast<size_t>(wp) * patch;  // packed row-group
    const int hw = width / 2, hh = height / 2;
    for (int r = 0; r < height; ++r) {
        const uint8_t* grp = packed + static_cast<size_t>(r / b) * prow +
                             static_cast<size_t>(r % b) * b * 3;
        uint8_t* yr = y_out + static_cast<size_t>(r) * width;
        for (int j = 0; j < wp; ++j) {
            const uint8_t* px = grp + static_cast<size_t>(j) * patch;
            for (int dx = 0; dx < b; ++dx) {
                int R = px[dx * 3], G = px[dx * 3 + 1], B = px[dx * 3 + 2];
                yr[j * b + dx] =
                    clamp_u8(((66 * R + 129 * G + 25 * B + 128) >> 8) + 16);
            }
        }
    }
    // chroma: averaged from each 2x2 block, in a separate pass below
    for (int cr = 0; cr < hh; ++cr) {
        uint8_t* ur = u_out + static_cast<size_t>(cr) * hw;
        uint8_t* vr = v_out + static_cast<size_t>(cr) * hw;
        for (int cc = 0; cc < hw; ++cc) {
            int R = 0, G = 0, B = 0;
            for (int dy = 0; dy < 2; ++dy) {
                int r = 2 * cr + dy;
                const uint8_t* grp = packed +
                                     static_cast<size_t>(r / b) * prow +
                                     static_cast<size_t>(r % b) * b * 3;
                for (int dx2 = 0; dx2 < 2; ++dx2) {
                    int c = 2 * cc + dx2;
                    const uint8_t* px =
                        grp + static_cast<size_t>(c / b) * patch + (c % b) * 3;
                    R += px[0]; G += px[1]; B += px[2];
                }
            }
            R /= 4; G /= 4; B /= 4;
            ur[cc] = clamp_u8(((-38 * R - 74 * G + 112 * B + 128) >> 8) + 128);
            vr[cc] = clamp_u8(((112 * R - 94 * G - 18 * B + 128) >> 8) + 128);
        }
    }
}

}  // extern "C"
