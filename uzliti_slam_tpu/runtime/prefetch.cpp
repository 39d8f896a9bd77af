// Async frame prefetcher — the native data loader.
//
// The reference's front-end ingests frames through C++ camera listeners on
// a multi-threaded nodelet (RGBDCameraListerner + ApproximateTime sync,
// feature_extraction_service_node.h:44-58); here the dataset-playback
// equivalent is a worker pool that reads + PNG-decodes (rgb, depth) pairs
// ahead of the TPU pipeline, delivering frames IN SUBMISSION ORDER through
// a bounded ring so host decode overlaps device compute instead of
// serializing with it.
//
// Decode reuses png_decode.cpp (same .so).

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" int png_probe(const uint8_t* data, long len, int* w, int* h);
extern "C" int png_decode_gray_f32(const uint8_t* data, long len, float* out,
                                   int out_cap);

namespace {

struct Image {
    int w = 0, h = 0;
    int err = 0;  // 0 ok; <0 decode/read error
    std::vector<float> px;
};

static int read_decode(const std::string& path, Image* out) {
    if (path.empty()) {
        out->err = 0;  // absent second stream (monocular)
        return 0;
    }
    FILE* f = fopen(path.c_str(), "rb");
    if (!f) { out->err = -10; return -10; }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf((size_t)n);
    if (n > 0 && fread(buf.data(), 1, (size_t)n, f) != (size_t)n) {
        fclose(f);
        out->err = -11;
        return -11;
    }
    fclose(f);
    int w = 0, h = 0;
    int rc = png_probe(buf.data(), n, &w, &h);
    if (rc != 0) { out->err = -12; return -12; }
    out->w = w;
    out->h = h;
    out->px.resize((size_t)w * h);
    rc = png_decode_gray_f32(buf.data(), n, out->px.data(), w * h);
    if (rc != 0) { out->err = -13; return -13; }
    return 0;
}

struct Job {
    long seq;
    std::string path_a, path_b;
};

struct Result {
    Image a, b;
};

struct Prefetcher {
    std::mutex mu;
    std::condition_variable cv_worker;   // new jobs / shutdown
    std::condition_variable cv_consumer; // results ready
    std::condition_variable cv_producer; // ring has room
    std::deque<Job> jobs;
    std::map<long, Result> done;
    long next_submit = 0;
    long next_out = 0;
    long inflight_cap;
    bool shutdown = false;
    std::vector<std::thread> workers;

    explicit Prefetcher(int n_threads, int capacity)
        : inflight_cap(capacity < 1 ? 1 : capacity) {
        for (int i = 0; i < (n_threads < 1 ? 1 : n_threads); ++i)
            workers.emplace_back([this] { this->run(); });
    }

    void run() {
        for (;;) {
            Job job;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_worker.wait(lk, [&] { return shutdown || !jobs.empty(); });
                if (shutdown && jobs.empty()) return;
                job = std::move(jobs.front());
                jobs.pop_front();
            }
            Result r;
            read_decode(job.path_a, &r.a);
            read_decode(job.path_b, &r.b);
            {
                std::lock_guard<std::mutex> lk(mu);
                done.emplace(job.seq, std::move(r));
            }
            cv_consumer.notify_all();
        }
    }

    long submit(const char* a, const char* b) {
        std::unique_lock<std::mutex> lk(mu);
        cv_producer.wait(lk, [&] {
            return shutdown || next_submit - next_out < inflight_cap;
        });
        if (shutdown) return -1;
        long seq = next_submit++;
        jobs.push_back(Job{seq, a ? a : "", b ? b : ""});
        cv_worker.notify_one();
        return seq;
    }

    // Blocking in-order fetch; returns 0 ok, <0 error code from decode.
    int next(float* out_a, long cap_a, int* wa, int* ha,
             float* out_b, long cap_b, int* wb, int* hb) {
        Result r;
        {
            std::unique_lock<std::mutex> lk(mu);
            if (next_out >= next_submit) return -1;  // nothing submitted
            long seq = next_out;
            cv_consumer.wait(lk, [&] { return done.count(seq) > 0; });
            r = std::move(done[seq]);
            done.erase(seq);
            next_out++;
        }
        cv_producer.notify_all();
        if (r.a.err) return r.a.err;
        if (r.b.err) return r.b.err;
        if ((long)r.a.px.size() > cap_a || (long)r.b.px.size() > cap_b)
            return -20;
        *wa = r.a.w; *ha = r.a.h;
        if (!r.a.px.empty())
            memcpy(out_a, r.a.px.data(), r.a.px.size() * sizeof(float));
        *wb = r.b.w; *hb = r.b.h;
        if (!r.b.px.empty())
            memcpy(out_b, r.b.px.data(), r.b.px.size() * sizeof(float));
        return 0;
    }

    void stop() {
        {
            std::lock_guard<std::mutex> lk(mu);
            shutdown = true;
        }
        cv_worker.notify_all();
        cv_producer.notify_all();
        for (auto& t : workers) t.join();
        workers.clear();
    }
};

}  // namespace

extern "C" {

void* prefetch_create(int n_threads, int capacity) {
    return new Prefetcher(n_threads, capacity);
}

long prefetch_submit(void* h, const char* path_a, const char* path_b) {
    return static_cast<Prefetcher*>(h)->submit(path_a, path_b);
}

int prefetch_next(void* h, float* out_a, long cap_a, int* wa, int* ha,
                  float* out_b, long cap_b, int* wb, int* hb) {
    return static_cast<Prefetcher*>(h)->next(out_a, cap_a, wa, ha,
                                             out_b, cap_b, wb, hb);
}

void prefetch_destroy(void* h) {
    auto* p = static_cast<Prefetcher*>(h);
    p->stop();
    delete p;
}

}  // extern "C"
