// NCCF/RAPT-style pitch tracker with dynamic-programming voicing.
//
// Native replacement for the pitch extractor binary the reference
// bundles (a REAPER build emitting a sample-synchronous int16 F0
// track; see /root/reference/src/daft_exprt/extract_features.py:222-269
// for the consumer contract). Same CLI surface:
//
//   pitch_tracker -i in.wav -a -f out.f0 -e 0.005 -m 40 -x 500
//                 -u 0.01 -w 0.9   (single command line)
//
//   -i  input wav (16-bit PCM, mono)
//   -f  output .f0 path: raw int16, ONE value per input sample,
//       unvoiced samples are 0 (the reference reads this as PCM and
//       decimates by hop_length)
//   -e  analysis frame interval in seconds
//   -m/-x  min/max F0 in Hz
//   -u  (accepted for CLI compat; unused -- reference declares but
//       never consumes it downstream either)
//   -w  voicing cost weight: higher = more reluctant to call voiced
//   -a  accepted for CLI compat (ascii flag in the original tool)
//
// Algorithm (identical math to daft_exprt_tpu/audio/pitch.py, which is
// the golden Python implementation this binary is parity-tested
// against; the cost model is calibrated against the reference's actual
// REAPER binary on real speech -- see docs/PARITY.md):
//   0. 80 Hz rumble high-pass (255-tap Hann-windowed sinc FIR)
//   1. frames every round(e * fs / 2) samples (2x oversampled
//      analysis); window = round(0.0075 * fs) samples;
//      lags k in [floor(fs/max_f0), ceil(fs/min_f0)]
//   2. NCCF(i, k) = sum_j x[t+j] x[t+j+k] / sqrt(e0 * ek)
//   3. top-5 lag candidates per frame; Viterbi over
//      {unvoiced, candidates} with octave-jump cost 0.35/octave,
//      voiced<->unvoiced transition cost 0.7, quiet-frame penalty
//      0.1 * max(0, -35dB - rel_rms_db) on voiced candidates;
//      unvoiced local cost 1 - 1/(1 + w)
//   4. per-frame F0 held sample-synchronously until the next frame.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr double kFreqJumpCost = 0.35;
constexpr double kVuvTransitionCost = 0.7;
constexpr int kNumCands = 5;
// RAPT lag weight: favors shorter lags to break subharmonic ties of
// perfectly periodic signals (matches the Python implementation).
constexpr double kLagWtFraction = 0.3;
constexpr double kWindowSec = 0.0075;   // correlation window
constexpr int kOversample = 2;          // analysis grid vs -e interval
constexpr double kHpCutoffHz = 80.0;    // rumble high-pass
constexpr int kHpTaps = 255;
constexpr double kSilenceAlpha = 0.1;   // quiet-frame voiced penalty
constexpr double kSilenceFloorDb = -35.0;

// Linear-phase high-pass FIR (Hann-windowed spectral inversion);
// identical to daft_exprt_tpu/audio/pitch.py:highpass_kernel.
std::vector<double> HighpassKernel(int fs) {
  std::vector<double> hp(kHpTaps);
  const double fc = kHpCutoffHz / fs;
  for (int i = 0; i < kHpTaps; ++i) {
    const double n = i - (kHpTaps - 1) / 2.0;
    const double sinc =
        (n == 0.0) ? 1.0 : std::sin(2.0 * M_PI * fc * n) / (M_PI * n * 2.0 * fc);
    double lp = 2.0 * fc * sinc;
    lp *= 0.5 - 0.5 * std::cos(2.0 * M_PI * i / (kHpTaps - 1));
    hp[i] = -lp;
  }
  hp[(kHpTaps - 1) / 2] += 1.0;
  return hp;
}

// 'same' convolution with zero boundary (np.convolve(..., 'same')).
std::vector<double> Filter(const std::vector<double>& x,
                           const std::vector<double>& k) {
  const int taps = k.size();
  const int half = (taps - 1) / 2;
  std::vector<double> out(x.size(), 0.0);
  for (size_t i = 0; i < x.size(); ++i) {
    double acc = 0.0;
    // out[i] = sum_j k[j] * x[i + half - j]
    const int j_lo = std::max(0, (int)i + half - (int)x.size() + 1);
    const int j_hi = std::min(taps - 1, (int)i + half);
    for (int j = j_lo; j <= j_hi; ++j) acc += k[j] * x[i + half - j];
    out[i] = acc;
  }
  return out;
}

struct WavData {
  std::vector<double> samples;
  int sample_rate = 0;
};

bool ReadWav(const std::string& path, WavData* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || fread(&riff_size, 4, 1, f) != 1 ||
      fread(wave, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) ||
      memcmp(wave, "WAVE", 4)) {
    fclose(f);
    return false;
  }
  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  std::vector<int16_t> pcm;
  char chunk_id[4];
  uint32_t chunk_size;
  while (fread(chunk_id, 1, 4, f) == 4 && fread(&chunk_size, 4, 1, f) == 1) {
    if (!memcmp(chunk_id, "fmt ", 4)) {
      std::vector<char> buf(chunk_size);
      if (fread(buf.data(), 1, chunk_size, f) != chunk_size) break;
      memcpy(&format, buf.data(), 2);
      memcpy(&channels, buf.data() + 2, 2);
      memcpy(&sample_rate, buf.data() + 4, 4);
      memcpy(&bits, buf.data() + 14, 2);
    } else if (!memcmp(chunk_id, "data", 4)) {
      pcm.resize(chunk_size / 2);
      if (fread(pcm.data(), 1, chunk_size, f) != chunk_size) break;
    } else {
      fseek(f, (chunk_size + 1) & ~1u, SEEK_CUR);
    }
  }
  fclose(f);
  if (format != 1 || bits != 16 || channels == 0 || sample_rate == 0) {
    return false;
  }
  size_t n = pcm.size() / channels;
  out->samples.resize(n);
  for (size_t i = 0; i < n; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) acc += pcm[i * channels + c];
    out->samples[i] = acc / channels / 32768.0;
  }
  out->sample_rate = static_cast<int>(sample_rate);
  return true;
}

// NCCF for one frame start over all lags. Energies via prefix sums.
void FrameNccf(const std::vector<double>& x,
               const std::vector<double>& energy_prefix, int64_t start,
               int window, int min_lag, int max_lag,
               std::vector<double>* out) {
  const double e0 = energy_prefix[start + window] - energy_prefix[start];
  out->assign(max_lag - min_lag + 1, -1.0);
  for (int k = min_lag; k <= max_lag; ++k) {
    double corr = 0.0;
    const double* a = x.data() + start;
    const double* b = x.data() + start + k;
    for (int j = 0; j < window; ++j) corr += a[j] * b[j];
    const double ek =
        energy_prefix[start + k + window] - energy_prefix[start + k];
    (*out)[k - min_lag] = corr / (std::sqrt(e0 * ek) + 1e-12);
  }
}

struct Track {
  std::vector<double> f0;       // per frame, 0 = unvoiced
  std::vector<int64_t> starts;  // frame start sample indices
};

Track TrackPitch(const std::vector<double>& raw, int fs, double interval,
                 double min_f0, double max_f0, double uv_weight) {
  Track track;
  const std::vector<double> x = Filter(raw, HighpassKernel(fs));
  const int min_lag = std::max(2, (int)std::floor(fs / max_f0));
  const int max_lag = (int)std::ceil(fs / min_f0);
  // std::nearbyint under the default FE_TONEAREST mode rounds half to
  // even, matching Python round() in audio/pitch.py (std::lround would
  // round half away from zero and shift the frame grid at .5 products).
  const int window = std::max(2, (int)std::nearbyint(kWindowSec * fs));
  const int step =
      std::max(1, (int)std::nearbyint(interval * fs / kOversample));
  const int64_t last = (int64_t)x.size() - (window + max_lag);
  if (last < 0) return track;
  for (int64_t s = 0; s <= last; s += step) track.starts.push_back(s);
  const int F = track.starts.size();

  std::vector<double> energy_prefix(x.size() + 1, 0.0);
  for (size_t i = 0; i < x.size(); ++i) {
    energy_prefix[i + 1] = energy_prefix[i] + x[i] * x[i];
  }

  // per-frame RMS in dB relative to the loudest analysis frame
  std::vector<double> rel_db(F);
  double max_db = -1e300;
  for (int i = 0; i < F; ++i) {
    const int64_t s = track.starts[i];
    const double e0 = energy_prefix[s + window] - energy_prefix[s];
    rel_db[i] = 20.0 * std::log10(std::sqrt(e0 / window) + 1e-9);
    max_db = std::max(max_db, rel_db[i]);
  }
  for (int i = 0; i < F; ++i) rel_db[i] -= max_db;

  // candidate extraction: top-N values (matching the Python argsort)
  const int n_states = kNumCands + 1;  // state 0 = unvoiced
  std::vector<std::vector<double>> cand_nccf(F), cand_log_lag(F);
  std::vector<std::vector<int>> cand_lag(F);
  std::vector<double> nccf;
  for (int i = 0; i < F; ++i) {
    FrameNccf(x, energy_prefix, track.starts[i], window, min_lag, max_lag,
              &nccf);
    std::vector<int> order(nccf.size());
    for (size_t j = 0; j < order.size(); ++j) order[j] = j;
    std::partial_sort(order.begin(), order.begin() + kNumCands, order.end(),
                      [&](int a, int b) { return nccf[a] > nccf[b]; });
    for (int c = 0; c < kNumCands; ++c) {
      const int lag = order[c] + min_lag;
      cand_nccf[i].push_back(nccf[order[c]]);
      cand_lag[i].push_back(lag);
      cand_log_lag[i].push_back(std::log2((double)lag));
    }
  }

  // Viterbi over {unvoiced, candidates}
  const double uv_cost = 1.0 - 1.0 / (1.0 + uv_weight);
  auto voiced_cost = [&](int frame, int cand) {
    return 1.0 - cand_nccf[frame][cand] *
                     (1.0 - kLagWtFraction * cand_lag[frame][cand] /
                                (double)max_lag) +
           kSilenceAlpha * std::max(0.0, kSilenceFloorDb - rel_db[frame]);
  };
  const double kInf = 1e18;
  std::vector<std::vector<double>> cost(F, std::vector<double>(n_states));
  std::vector<std::vector<int>> back(F, std::vector<int>(n_states, 0));
  for (int s = 0; s < n_states; ++s) {
    cost[0][s] = (s == 0) ? uv_cost : voiced_cost(0, s - 1);
  }
  for (int i = 1; i < F; ++i) {
    for (int s = 0; s < n_states; ++s) {
      double best = kInf;
      int best_prev = 0;
      for (int p = 0; p < n_states; ++p) {
        double trans = 0.0;
        if ((p == 0) != (s == 0)) {
          trans = kVuvTransitionCost;
        } else if (p != 0 && s != 0) {
          trans = kFreqJumpCost *
                  std::fabs(cand_log_lag[i - 1][p - 1] -
                            cand_log_lag[i][s - 1]);
        }
        const double total = cost[i - 1][p] + trans;
        if (total < best) {
          best = total;
          best_prev = p;
        }
      }
      const double local = (s == 0) ? uv_cost : voiced_cost(i, s - 1);
      cost[i][s] = best + local;
      back[i][s] = best_prev;
    }
  }
  std::vector<int> states(F);
  states[F - 1] = (int)(std::min_element(cost[F - 1].begin(),
                                         cost[F - 1].end()) -
                        cost[F - 1].begin());
  for (int i = F - 2; i >= 0; --i) states[i] = back[i + 1][states[i + 1]];

  track.f0.resize(F, 0.0);
  for (int i = 0; i < F; ++i) {
    if (states[i] > 0) track.f0[i] = (double)fs / cand_lag[i][states[i] - 1];
  }
  return track;
}

}  // namespace

int main(int argc, char** argv) {
  std::string in_path, out_path;
  double interval = 0.005, min_f0 = 40.0, max_f0 = 500.0, uv_weight = 0.9;
  for (int i = 1; i < argc; ++i) {
    std::string arg = argv[i];
    auto next = [&]() -> const char* {
      return (i + 1 < argc) ? argv[++i] : "";
    };
    if (arg == "-i") in_path = next();
    else if (arg == "-f") out_path = next();
    else if (arg == "-e") interval = atof(next());
    else if (arg == "-m") min_f0 = atof(next());
    else if (arg == "-x") max_f0 = atof(next());
    else if (arg == "-u") next();  // accepted, unused
    else if (arg == "-w") uv_weight = atof(next());
    else if (arg == "-a") continue;  // accepted, unused
  }
  if (in_path.empty() || out_path.empty()) {
    fprintf(stderr,
            "usage: pitch_tracker -i in.wav -f out.f0 [-e s] [-m hz] "
            "[-x hz] [-u s] [-w cost] [-a]\n");
    return 2;
  }
  WavData wav;
  if (!ReadWav(in_path, &wav)) {
    fprintf(stderr, "cannot read 16-bit PCM wav: %s\n", in_path.c_str());
    return 1;
  }
  Track track = TrackPitch(wav.samples, wav.sample_rate, interval, min_f0,
                           max_f0, uv_weight);

  // sample-synchronous int16 output (one value per input sample)
  std::vector<int16_t> out(wav.samples.size(), 0);
  if (!track.starts.empty()) {
    for (size_t i = 0; i < track.starts.size(); ++i) {
      const int64_t begin = (i == 0) ? 0 : track.starts[i];
      const int64_t end = (i + 1 < track.starts.size())
                              ? track.starts[i + 1]
                              : (int64_t)out.size();
      const int16_t value = (int16_t)std::nearbyint(track.f0[i]);
      for (int64_t s = begin; s < end; ++s) out[s] = value;
    }
  }
  FILE* f = fopen(out_path.c_str(), "wb");
  if (!f) {
    fprintf(stderr, "cannot write %s\n", out_path.c_str());
    return 1;
  }
  fwrite(out.data(), sizeof(int16_t), out.size(), f);
  fclose(f);
  return 0;
}
