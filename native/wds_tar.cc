// Native webdataset tar shard reader: the data-loader hot path.
//
// N reader threads stream tar shards (512-byte header framing, GNU/pax
// aware enough for webdataset output), group member files by sample key,
// and push complete samples into one bounded MPMC queue — no Python/GIL on
// the IO+parse path. Python consumes via the ctypes ABI below
// (pea_diffusion_tpu/data/native_reader.py); JPEG decode stays in PIL/cv2
// on the consumer side (SURVEY.md §2c keeps image decode in C either way).
//
// ABI (extern "C"):
//   void*  wds_open(const char** paths, int n, int threads, int cap);
//   long   wds_next(void* h, WdsEntry** out, int* n_entries);  // 1 ok, 0 end
//   void   wds_free_sample(WdsEntry* e, int n);
//   void   wds_close(void* h);
//   long   wds_samples_read(void* h);
//   long   wds_errors(void* h);

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {
struct WdsEntry {
  char* ext;       // extension ("jpg", "json", ...)
  char* key;       // sample key (tar member name up to last '.')
  uint8_t* data;   // file bytes
  int64_t size;
};
}

namespace {

struct Sample {
  std::vector<WdsEntry> entries;
};

struct Reader {
  std::vector<std::string> paths;
  std::atomic<size_t> next_shard{0};
  std::atomic<long> samples_read{0};
  std::atomic<long> errors{0};

  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::deque<Sample> queue;
  size_t capacity;
  int active_threads;
  bool closed = false;
  std::vector<std::thread> threads;

  void push(Sample&& s) {
    std::unique_lock<std::mutex> lk(mu);
    cv_push.wait(lk, [&] { return queue.size() < capacity || closed; });
    if (closed) {
      free_sample(s);
      return;
    }
    queue.push_back(std::move(s));
    cv_pop.notify_one();
  }

  static void free_sample(Sample& s) {
    for (auto& e : s.entries) {
      free(e.ext);
      free(e.key);
      free(e.data);
    }
    s.entries.clear();
  }

  void worker() {
    for (;;) {
      size_t i = next_shard.fetch_add(1);
      if (i >= paths.size()) break;
      read_shard(paths[i]);
    }
    std::unique_lock<std::mutex> lk(mu);
    if (--active_threads == 0) cv_pop.notify_all();
  }

  void read_shard(const std::string& path) {
    FILE* f = fopen(path.c_str(), "rb");
    if (!f) {
      errors++;
      fprintf(stderr, "[wds_tar] cannot open %s\n", path.c_str());
      return;
    }
    Sample current;
    std::string current_key;
    uint8_t hdr[512];
    std::string longname;
    while (fread(hdr, 1, 512, f) == 512) {
      if (hdr[0] == 0) break;  // end-of-archive blocks
      char name[257] = {0};
      // ustar prefix field (offset 345) + name
      if (memcmp(hdr + 257, "ustar", 5) == 0 && hdr[345]) {
        size_t p = strnlen((char*)hdr + 345, 155);
        memcpy(name, hdr + 345, p);
        name[p] = '/';
        memcpy(name + p + 1, hdr, strnlen((char*)hdr, 100));
      } else {
        memcpy(name, hdr, 100);
      }
      int64_t size = strtoll((char*)hdr + 124, nullptr, 8);
      char type = hdr[156];
      int64_t padded = (size + 511) & ~511LL;

      if (type == 'L') {  // GNU longname: next data block holds the name
        std::vector<char> buf(padded);
        if (fread(buf.data(), 1, padded, f) != (size_t)padded) break;
        longname.assign(buf.data(), size);
        while (!longname.empty() && longname.back() == '\0')
          longname.pop_back();
        continue;
      }
      std::string fname = longname.empty() ? std::string(name) : longname;
      longname.clear();

      bool is_file = (type == '0' || type == 0 || type == '\0');
      if (!is_file || size < 0) {
        if (fseek(f, (long)padded, SEEK_CUR) != 0) break;
        continue;
      }
      uint8_t* data = (uint8_t*)malloc(size > 0 ? size : 1);
      if (fread(data, 1, size, f) != (size_t)size) {
        free(data);
        errors++;
        break;  // truncated shard: keep what we have
      }
      fseek(f, (long)(padded - size), SEEK_CUR);

      auto dot = fname.rfind('.');
      std::string key = dot == std::string::npos ? fname : fname.substr(0, dot);
      std::string ext = dot == std::string::npos ? "" : fname.substr(dot + 1);
      for (auto& c : ext) c = (char)tolower(c);

      if (key != current_key) {
        if (!current.entries.empty()) {
          samples_read++;
          push(std::move(current));
          current = Sample{};
        }
        current_key = key;
      }
      WdsEntry e;
      e.ext = strdup(ext.c_str());
      e.key = strdup(key.c_str());
      e.data = data;
      e.size = size;
      current.entries.push_back(e);
    }
    if (!current.entries.empty()) {
      samples_read++;
      push(std::move(current));
    }
    fclose(f);
  }
};

}  // namespace

extern "C" {

void* wds_open(const char** paths, int n, int threads, int cap) {
  auto* r = new Reader();
  for (int i = 0; i < n; i++) r->paths.emplace_back(paths[i]);
  r->capacity = cap > 0 ? cap : 64;
  if (threads <= 0) threads = 2;
  if ((size_t)threads > r->paths.size() && !r->paths.empty())
    threads = (int)r->paths.size();
  r->active_threads = threads;
  for (int i = 0; i < threads; i++)
    r->threads.emplace_back([r] { r->worker(); });
  return r;
}

long wds_next(void* h, WdsEntry** out, int* n_entries) {
  auto* r = (Reader*)h;
  std::unique_lock<std::mutex> lk(r->mu);
  r->cv_pop.wait(lk, [&] {
    return !r->queue.empty() || r->active_threads == 0 || r->closed;
  });
  if (r->queue.empty()) return 0;
  Sample s = std::move(r->queue.front());
  r->queue.pop_front();
  r->cv_push.notify_one();
  lk.unlock();
  int n = (int)s.entries.size();
  auto* arr = (WdsEntry*)malloc(sizeof(WdsEntry) * n);
  for (int i = 0; i < n; i++) arr[i] = s.entries[i];
  *out = arr;
  *n_entries = n;
  return 1;
}

void wds_free_sample(WdsEntry* e, int n) {
  for (int i = 0; i < n; i++) {
    free(e[i].ext);
    free(e[i].key);
    free(e[i].data);
  }
  free(e);
}

void wds_close(void* h) {
  auto* r = (Reader*)h;
  {
    std::unique_lock<std::mutex> lk(r->mu);
    r->closed = true;
    r->next_shard = r->paths.size();  // stop pulling new shards
    for (auto& s : r->queue) Reader::free_sample(s);
    r->queue.clear();
    r->cv_push.notify_all();
    r->cv_pop.notify_all();
  }
  for (auto& t : r->threads) t.join();
  delete r;
}

long wds_samples_read(void* h) { return ((Reader*)h)->samples_read.load(); }
long wds_errors(void* h) { return ((Reader*)h)->errors.load(); }

}  // extern "C"
