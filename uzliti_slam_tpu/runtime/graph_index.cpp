// Host-side graph runtime: uid hashmap, 2-D spatial hash, delta log.
//
// Native counterparts of the reference's host data structures
// (graph_slam_common/src/slam_graph.cpp): the std::map<string, SlamNode>
// keyed lookups become an open-addressing int hashmap; getNodesWithinRadius
// (linear scan, slam_graph.cpp:266-278) becomes a bucketed spatial hash;
// the rosbag-per-entity persistence (rosbag_storage.cpp:62-236) becomes an
// append-only binary record log with CRC framing. These run on the host
// around the jitted device steps: identity management and incremental
// persistence are pointer-chasing workloads the TPU has no business doing.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <vector>
#include <unordered_map>

namespace {

struct UidMap {
    std::unordered_map<int32_t, int32_t> m;
};

struct SpatialHash {
    float cell;
    std::unordered_map<int64_t, std::vector<int32_t>> buckets;
    std::unordered_map<int32_t, std::pair<float, float>> pos;
    int64_t key(float x, float y) const {
        int64_t cx = (int64_t)std::floor(x / cell);
        int64_t cy = (int64_t)std::floor(y / cell);
        return (cx << 32) ^ (cy & 0xffffffffLL);
    }
};

struct DeltaLog {
    FILE* f = nullptr;
};

uint32_t crc32_simple(const uint8_t* data, size_t n) {
    uint32_t crc = 0xFFFFFFFFu;
    for (size_t i = 0; i < n; i++) {
        crc ^= data[i];
        for (int k = 0; k < 8; k++)
            crc = (crc >> 1) ^ (0xEDB88320u & (~(crc & 1) + 1));
    }
    return ~crc;
}

}  // namespace

extern "C" {

// ---------- uid map ----------
void* uidmap_create() { return new UidMap(); }
void uidmap_destroy(void* h) { delete (UidMap*)h; }
void uidmap_insert(void* h, int32_t uid, int32_t slot) {
    ((UidMap*)h)->m[uid] = slot;
}
int32_t uidmap_lookup(void* h, int32_t uid) {
    auto& m = ((UidMap*)h)->m;
    auto it = m.find(uid);
    return it == m.end() ? -1 : it->second;
}
void uidmap_remove(void* h, int32_t uid) { ((UidMap*)h)->m.erase(uid); }
long uidmap_size(void* h) { return (long)((UidMap*)h)->m.size(); }
// bulk ops for array-at-a-time use from python
void uidmap_insert_batch(void* h, const int32_t* uids, const int32_t* slots, long n) {
    auto& m = ((UidMap*)h)->m;
    for (long i = 0; i < n; i++) m[uids[i]] = slots[i];
}
void uidmap_lookup_batch(void* h, const int32_t* uids, int32_t* out, long n) {
    auto& m = ((UidMap*)h)->m;
    for (long i = 0; i < n; i++) {
        auto it = m.find(uids[i]);
        out[i] = it == m.end() ? -1 : it->second;
    }
}

// ---------- spatial hash ----------
void* spatial_create(float cell_size) {
    auto* s = new SpatialHash();
    s->cell = cell_size;
    return s;
}
void spatial_destroy(void* h) { delete (SpatialHash*)h; }

void spatial_insert(void* h, int32_t slot, float x, float y) {
    auto* s = (SpatialHash*)h;
    auto it = s->pos.find(slot);
    if (it != s->pos.end()) {
        auto& old = s->buckets[s->key(it->second.first, it->second.second)];
        for (size_t i = 0; i < old.size(); i++)
            if (old[i] == slot) { old[i] = old.back(); old.pop_back(); break; }
    }
    s->pos[slot] = {x, y};
    s->buckets[s->key(x, y)].push_back(slot);
}

void spatial_remove(void* h, int32_t slot) {
    auto* s = (SpatialHash*)h;
    auto it = s->pos.find(slot);
    if (it == s->pos.end()) return;
    auto& v = s->buckets[s->key(it->second.first, it->second.second)];
    for (size_t i = 0; i < v.size(); i++)
        if (v[i] == slot) { v[i] = v.back(); v.pop_back(); break; }
    s->pos.erase(it);
}

// Returns number written into out (up to cap).
long spatial_query_radius(void* h, float x, float y, float r,
                          int32_t* out, long cap) {
    auto* s = (SpatialHash*)h;
    long count = 0;
    float r2 = r * r;
    int64_t cx0 = (int64_t)std::floor((x - r) / s->cell);
    int64_t cx1 = (int64_t)std::floor((x + r) / s->cell);
    int64_t cy0 = (int64_t)std::floor((y - r) / s->cell);
    int64_t cy1 = (int64_t)std::floor((y + r) / s->cell);
    for (int64_t cx = cx0; cx <= cx1; cx++) {
        for (int64_t cy = cy0; cy <= cy1; cy++) {
            auto it = s->buckets.find((cx << 32) ^ (cy & 0xffffffffLL));
            if (it == s->buckets.end()) continue;
            for (int32_t slot : it->second) {
                auto& p = s->pos[slot];
                float dx = p.first - x, dy = p.second - y;
                if (dx * dx + dy * dy <= r2) {
                    if (count < cap) out[count] = slot;
                    count++;
                }
            }
        }
    }
    return count < cap ? count : cap;
}
long spatial_size(void* h) { return (long)((SpatialHash*)h)->pos.size(); }

// ---------- append-only delta log ----------
// Record framing: [u32 magic 0x554C4F47][u32 type][u32 payload_len]
//                 [payload][u32 crc32(payload)]
static const uint32_t LOG_MAGIC = 0x554C4F47u;  // "ULOG"

void* deltalog_open(const char* path, int append) {
    auto* d = new DeltaLog();
    d->f = fopen(path, append ? "ab" : "wb");
    if (!d->f) { delete d; return nullptr; }
    return d;
}
void deltalog_close(void* h) {
    auto* d = (DeltaLog*)h;
    if (d->f) fclose(d->f);
    delete d;
}
int deltalog_append(void* h, uint32_t type, const uint8_t* payload, long n) {
    auto* d = (DeltaLog*)h;
    if (!d->f) return -1;
    uint32_t hdr[3] = {LOG_MAGIC, type, (uint32_t)n};
    uint32_t crc = crc32_simple(payload, (size_t)n);
    if (fwrite(hdr, 4, 3, d->f) != 3) return -2;
    if (n && fwrite(payload, 1, (size_t)n, d->f) != (size_t)n) return -2;
    if (fwrite(&crc, 4, 1, d->f) != 1) return -2;
    fflush(d->f);
    return 0;
}

// Reader: iterate records; returns payload length (>=0), -1 EOF, -2 corrupt.
// Caller passes a buffer of cap bytes; type written to *type_out.
long deltalog_read(FILE* f, uint32_t* type_out, uint8_t* buf, long cap);

void* deltalog_open_read(const char* path) { return fopen(path, "rb"); }
void deltalog_close_read(void* f) { if (f) fclose((FILE*)f); }
long deltalog_next(void* fv, uint32_t* type_out, uint8_t* buf, long cap) {
    FILE* f = (FILE*)fv;
    uint32_t hdr[3];
    if (fread(hdr, 4, 3, f) != 3) return -1;
    if (hdr[0] != LOG_MAGIC) return -2;
    long n = (long)hdr[2];
    if (n > cap) return -3;
    if (n && fread(buf, 1, (size_t)n, f) != (size_t)n) return -2;
    uint32_t crc;
    if (fread(&crc, 4, 1, f) != 1) return -2;
    if (crc != crc32_simple(buf, (size_t)n)) return -2;
    *type_out = hdr[1];
    return n;
}

}  // extern "C"
