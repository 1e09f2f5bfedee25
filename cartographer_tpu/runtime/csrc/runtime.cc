// Native runtime substrate for cartographer_tpu.
//
// C++ equivalents of the reference's host-side runtime components
// (SURVEY.md §2.1): a bounded MPMC BlockingQueue
// (common/internal/blocking_queue.h), a ThreadPool with task-DAG
// dependencies (common/thread_pool.{h,cc}, common/task.{h,cc}) and the
// OrderedMultiQueue merge-sort dispatch engine
// (sensor/internal/ordered_multi_queue.{h,cc}).
//
// Exposed through a C API consumed via ctypes (the image ships no pybind11).
// Python-object payloads stay on the Python side: queues carry opaque
// int64 item handles, and the OrderedMultiQueue returns dispatch decisions
// (which handle to deliver next) rather than owning data.

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <functional>
#include <map>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// BlockingQueue
// ---------------------------------------------------------------------------

struct BlockingQueue {
  std::mutex mu;
  std::condition_variable not_empty;
  std::condition_variable not_full;
  std::deque<int64_t> items;
  size_t capacity;  // 0 = unbounded
};

BlockingQueue* bq_create(size_t capacity) {
  auto* q = new BlockingQueue();
  q->capacity = capacity;
  return q;
}

void bq_destroy(BlockingQueue* q) { delete q; }

void bq_push(BlockingQueue* q, int64_t item) {
  std::unique_lock<std::mutex> lock(q->mu);
  q->not_full.wait(lock, [q] {
    return q->capacity == 0 || q->items.size() < q->capacity;
  });
  q->items.push_back(item);
  q->not_empty.notify_one();
}

// Returns 1 on success, 0 on timeout. timeout_ms < 0 blocks forever.
int bq_pop(BlockingQueue* q, int64_t* out, int64_t timeout_ms) {
  std::unique_lock<std::mutex> lock(q->mu);
  auto ready = [q] { return !q->items.empty(); };
  if (timeout_ms < 0) {
    q->not_empty.wait(lock, ready);
  } else if (!q->not_empty.wait_for(lock, std::chrono::milliseconds(timeout_ms),
                                    ready)) {
    return 0;
  }
  *out = q->items.front();
  q->items.pop_front();
  q->not_full.notify_one();
  return 1;
}

size_t bq_size(BlockingQueue* q) {
  std::unique_lock<std::mutex> lock(q->mu);
  return q->items.size();
}

// ---------------------------------------------------------------------------
// ThreadPool with task-DAG dependencies
// ---------------------------------------------------------------------------
// Tasks are identified by int64 ids; work items are C callbacks (from ctypes,
// Python re-acquires the GIL inside). A task runs only when all its
// dependencies completed (common/task.cc state machine).

typedef void (*task_fn)(void* arg);

struct Task {
  task_fn fn = nullptr;
  void* arg = nullptr;
  int uncompleted_deps = 0;
  bool dispatched = false;
  bool completed = false;
  std::vector<int64_t> dependents;
};

struct ThreadPool {
  std::mutex mu;
  std::condition_variable work_available;
  std::condition_variable all_done;
  std::map<int64_t, Task> tasks;
  std::deque<int64_t> ready;
  std::vector<std::thread> threads;
  bool shutting_down = false;
  int64_t next_id = 1;
  int in_flight = 0;

  void worker() {
    for (;;) {
      int64_t id;
      Task* task;
      {
        std::unique_lock<std::mutex> lock(mu);
        work_available.wait(lock,
                            [this] { return shutting_down || !ready.empty(); });
        if (shutting_down && ready.empty()) return;
        id = ready.front();
        ready.pop_front();
        task = &tasks[id];
        ++in_flight;
      }
      if (task->fn) task->fn(task->arg);
      {
        std::unique_lock<std::mutex> lock(mu);
        task->completed = true;
        for (int64_t dep_id : task->dependents) {
          Task& dep = tasks[dep_id];
          if (--dep.uncompleted_deps == 0 && dep.dispatched) {
            ready.push_back(dep_id);
            work_available.notify_one();
          }
        }
        --in_flight;
        if (ready.empty() && in_flight == 0) all_done.notify_all();
      }
    }
  }
};

ThreadPool* tp_create(int num_threads) {
  auto* pool = new ThreadPool();
  for (int i = 0; i < num_threads; ++i) {
    pool->threads.emplace_back([pool] { pool->worker(); });
  }
  return pool;
}

void tp_destroy(ThreadPool* pool) {
  {
    std::unique_lock<std::mutex> lock(pool->mu);
    pool->shutting_down = true;
    pool->work_available.notify_all();
  }
  for (auto& t : pool->threads) t.join();
  delete pool;
}

// Create a task (not yet scheduled); returns its id.
int64_t tp_create_task(ThreadPool* pool, task_fn fn, void* arg) {
  std::unique_lock<std::mutex> lock(pool->mu);
  int64_t id = pool->next_id++;
  Task& t = pool->tasks[id];
  t.fn = fn;
  t.arg = arg;
  return id;
}

// task depends on dependency (dependency must complete first).
void tp_add_dependency(ThreadPool* pool, int64_t task_id, int64_t dependency_id) {
  std::unique_lock<std::mutex> lock(pool->mu);
  Task& dep = pool->tasks[dependency_id];
  if (dep.completed) return;
  dep.dependents.push_back(task_id);
  ++pool->tasks[task_id].uncompleted_deps;
}

// Schedule: the task becomes runnable once its dependencies complete.
void tp_schedule(ThreadPool* pool, int64_t task_id) {
  std::unique_lock<std::mutex> lock(pool->mu);
  Task& t = pool->tasks[task_id];
  t.dispatched = true;
  if (t.uncompleted_deps == 0) {
    pool->ready.push_back(task_id);
    pool->work_available.notify_one();
  }
}

// Block until every scheduled task has finished.
void tp_wait_idle(ThreadPool* pool) {
  std::unique_lock<std::mutex> lock(pool->mu);
  pool->all_done.wait(lock, [pool] {
    return pool->ready.empty() && pool->in_flight == 0;
  });
}

// ---------------------------------------------------------------------------
// OrderedMultiQueue dispatch engine
// ---------------------------------------------------------------------------
// Keys are dense ints assigned by the caller. Items are (time, handle).
// After every mutation, callers drain ready dispatches with omq_next().

struct OmqQueue {
  std::deque<std::pair<int64_t, int64_t>> items;  // (time, handle)
  bool finished = false;
};

struct OrderedMultiQueue {
  std::map<int64_t, OmqQueue> queues;
  int64_t last_dispatched_time = INT64_MIN;
  int64_t blocker = -1;
};

OrderedMultiQueue* omq_create() { return new OrderedMultiQueue(); }
void omq_destroy(OrderedMultiQueue* q) { delete q; }

void omq_add_queue(OrderedMultiQueue* q, int64_t key) { q->queues[key]; }

void omq_finish_queue(OrderedMultiQueue* q, int64_t key) {
  auto it = q->queues.find(key);
  if (it != q->queues.end()) it->second.finished = true;
}

// Returns 0 if the key is unknown (data dropped, like the reference).
int omq_add(OrderedMultiQueue* q, int64_t key, int64_t time, int64_t handle) {
  auto it = q->queues.find(key);
  if (it == q->queues.end()) return 0;
  it->second.items.emplace_back(time, handle);
  return 1;
}

// Next dispatchable item; returns 1 and fills outputs, 0 if blocked/empty,
// or -1 if the head item would dispatch out of order (the reference CHECKs,
// ordered_multi_queue.cc Dispatch; the Python wrapper raises).
// Implements the merge-sort rule: dispatch the minimum-time head only when
// every unfinished queue is non-empty (ordered_multi_queue.cc).
int omq_next(OrderedMultiQueue* q, int64_t* out_key, int64_t* out_time,
             int64_t* out_handle) {
  const OmqQueue* best = nullptr;
  int64_t best_key = -1;
  bool all_finished_and_empty = true;
  for (auto& kv : q->queues) {
    OmqQueue& oq = kv.second;
    if (oq.items.empty()) {
      if (!oq.finished) {
        q->blocker = kv.first;
        return 0;
      }
      continue;
    }
    all_finished_and_empty = false;
    if (best == nullptr || oq.items.front().first < best->items.front().first) {
      best = &oq;
      best_key = kv.first;
    }
  }
  if (best == nullptr || all_finished_and_empty) return 0;
  auto& mutable_best = q->queues[best_key];
  *out_key = best_key;
  *out_time = mutable_best.items.front().first;
  *out_handle = mutable_best.items.front().second;
  if (*out_time < q->last_dispatched_time) return -1;
  mutable_best.items.pop_front();
  q->last_dispatched_time = *out_time;
  // Drop fully finished empty queues.
  for (auto it = q->queues.begin(); it != q->queues.end();) {
    if (it->second.finished && it->second.items.empty()) {
      it = q->queues.erase(it);
    } else {
      ++it;
    }
  }
  return 1;
}

int64_t omq_blocker(OrderedMultiQueue* q) { return q->blocker; }

}  // extern "C"
