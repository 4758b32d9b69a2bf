package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Multimodal
import Q.QueryFn

/** Driver-checked queries for the multimodal plumbing. mm1-mm4 run the
  * codec-free byte paths (deterministic arithmetic, exact oracles over
  * ASCII bytes); mm5 exercises the REAL JDK-codec decode (ImageIO) over
  * synthesized PNGs with a value-level oracle — lossless round trip.
  */
object MultimodalQueries {

  val queries: Map[String, QueryFn] = Map(
    "mm1_media_schema" -> ((s, dir) =>
      Multimodal.fromText(Tables.documents(s, dir), "doc_id", "text")
        .select(col("media_id"), length(col("content")).as("n_bytes"),
          col("meta.modality").as("modality"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.frames").as("frames"))),

    // features joined to a CSV string: the driver's pandas canonicalizer
    // cannot sort/hash ARRAY cells, so both sides project a scalar.
    "mm2_feature_extract" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.fromText(Tables.documents(s, dir), "doc_id", "text"))
        .withColumn("features",
          array_join(col("features").cast("array<string>"), ","))),

    "mm3_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.fromText(Tables.documents(s, dir), "doc_id", "text",
          modality = "video"), stride = 5)
        .select(col("media_id"), col("frame_idx"),
          length(col("frame_bytes")).as("frame_len"))),

    "mm5_real_decode" -> ((s, dir) => {
      // REAL JDK-codec decode end to end (r5): executors synthesize one
      // solid-color PNG per row, ImageIO decodes actual pixels, and
      // because PNG is lossless the channel means recover the exact
      // (id*7, id*13, id*29) % 256 colors — a full value-level oracle
      // over a genuine encode -> decode round trip.
      import s.implicits._
      val media = s.range(50).as[Long].mapPartitions { it =>
        it.map(id => (id, Multimodal.syntheticPng(id, 8, 6)))
      }.toDF("media_id", "content")
      Multimodal.decodeMedia(media)
    }),

    "mm6_video_meta" -> ((s, dir) => {
      // REAL MP4 container parse end to end: executors synthesize one
      // standards-valid ISO-BMFF file per row (ftyp/moov/mvhd/trak/
      // tkhd/mdia/hdlr boxes), parseMp4 walks the box tree back, and
      // every surfaced fact is id-derived arithmetic — a full
      // value-level oracle over a genuine build -> parse round trip.
      import s.implicits._
      val media = s.range(40).as[Long].mapPartitions { it =>
        it.map { id =>
          val k = (id % 9 + 1).toInt
          (id, Multimodal.syntheticMp4((id + 1) * 250, 16 * k, 9 * k,
            withAudio = id % 2 == 0))
        }
      }.toDF("media_id", "content")
      Multimodal.describeVideo(media)
    }),

    "mm7_exif" -> ((s, dir) => {
      // REAL EXIF parse end to end (r6): executors synthesize one
      // JPEG/APP1/TIFF block per row — byte order ALTERNATES per id
      // (II/MM), which the output never shows: the parser must
      // normalize both. Every surfaced fact is id-derived arithmetic.
      import s.implicits._
      val media = s.range(40).as[Long].mapPartitions { it =>
        it.map { id =>
          (id, Multimodal.syntheticJpegExif(
            (id % 8 + 1).toInt, (100 + id).toInt, (80 + id).toInt,
            "Cam" + (id % 5), f"2026:08:14 07:00:${id % 60}%02d",
            little = id % 2 == 0))
        }
      }.toDF("media_id", "content")
      Multimodal.describeExif(media)
    }),

    "mm4_resize" -> ((s, dir) =>
      // resize in the decode seam: new pixel budget caps the byte length,
      // meta rewritten to the target dimensions
      Multimodal.resize(
        Multimodal.fromText(Tables.documents(s, dir), "doc_id", "text"),
        w = 16, h = 12)
        .select(col("media_id"), length(col("content")).as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.frames").as("frames"))),

    "mm8_phash_dedup" -> ((s, dir) => {
      // perceptual-hash image near-dup (r10): executors synthesize one
      // gradient PNG per row (ids 40..49 replay ids 0..9 with one
      // perturbed cell — planted near-dups), ImageIO decodes REAL
      // pixels, dHash reduces each image to 64 gradient-sign bits, and
      // the pairs ride d4's Manku block banding. Full value-level
      // oracle: PNG losslessness + integer-only hash arithmetic let
      // DuckDB replay every gradient bit and every Hamming distance.
      import s.implicits._
      val media = s.range(50).as[Long].mapPartitions { it =>
        it.map(id => (id, Multimodal.syntheticGridPng(id)))
      }.toDF("media_id", "content")
      Multimodal.phashPairs(media, maxDist = 8)
    }),

    "mm9_phash_components" -> ((s, dir) => {
      // end-to-end image dedup (r10): 60 synthesized images = 10
      // planted near-dup TRIANGLES {i, i+40, i+50} (two different
      // perturbed cells) + 30 singletons; dHash edges feed the shared
      // label-propagation components; every image reports its cluster
      // key and whether a keep-one pipeline retains it. Full oracle:
      // the SQL side rebuilds the bit grids, the 30 triangle edges,
      // and (clusters being triangles, every member adjacent to the
      // min) the components as least(id, min(neighbor)).
      import s.implicits._
      val media = s.range(60).as[Long].mapPartitions { it =>
        it.map(id => (id, Multimodal.syntheticGridPng(id)))
      }.toDF("media_id", "content")
      Multimodal.phashDedup(media, maxDist = 8)
    }),

    "mm11_video_near_dup" -> ((s, dir) => {
      // video-level near-dup (r11): executors synthesize one 8-frame
      // "video" per row — 8 pattern PNGs packed into fixed 512-byte
      // blocks of one binary content column — then the REAL pipeline
      // runs end to end: sampleFrames slices the container back into
      // frames, ImageIO decodes real pixels, per-frame dHashes shingle
      // into ordered window-2 fingerprints, and d2's exact-Jaccard
      // discipline reports pairs. Videos 20..24 replay 0..4 with ONE
      // replaced frame (planted near-dups, jaccard 5/9); videos 25..29
      // replay 0..4 REVERSED — same frame SET, different order — and
      // must NOT pair (the ordered-shingle negative). Full oracle:
      // distinct pattern ids give distinct dHashes (pairwise Hamming
      // >= 6, simulated), so DuckDB replays shingle equality from the
      // pattern-id arithmetic alone.
      import s.implicits._
      val media = s.range(30).as[Long].mapPartitions { it =>
        it.map { v =>
          val content = new Array[Byte](512 * 8)
          (0 until 8).foreach { f =>
            val png = Multimodal.patternPng(mm11Pid(v, f))
            require(png.length <= 512, s"pattern png ${png.length}B > block")
            System.arraycopy(png, 0, content, f * 512, png.length)
          }
          (v, content)
        }
      }.toDF("media_id", "content")
        .withColumn("meta", struct(lit("video").as("modality"),
          lit(9).as("width"), lit(8).as("height"), lit(8).as("frames")))
      val frames = Multimodal.sampleFrames(media, stride = 1)
      Multimodal.videoNearDupPairs(frames, window = 2, threshold = 0.5)
        .select(col("video_a"), col("video_b"),
          round(col("jaccard"), 6).as("jaccard"))
    }),

    "mm10_audio_fingerprint" -> ((s, dir) => {
      // audio near-dup (r10): executors synthesize one PCM16 WAV per
      // row (constant-amplitude frames, ids 40..49 replay 0..9 with
      // one perturbed frame), the RIFF walk + frame-energy fingerprint
      // reduces each clip to 64 loudness-gradient bits, pairs ride the
      // shared Hamming banding. Full oracle: frame energies are exact
      // integer arithmetic both engines replay (planted pairs Hamming
      // <= 2, all others >= 14 at maxDist 8).
      import s.implicits._
      val media = s.range(50).as[Long].mapPartitions { it =>
        it.map(id => (id, Multimodal.syntheticWav(id)))
      }.toDF("media_id", "content")
      Multimodal.audioPairs(media, maxDist = 8)
    }))

  /** mm11 frame pattern ids: videos 0..19 all-distinct frames
    * (pid = v*8+f), 20..24 replay v-20 with frame 4 replaced by the
    * unique pid 400+v, 25..29 replay v-25 REVERSED. All pids distinct
    * mod 256 -> pairwise-distinct dHashes (simulated: min Hamming 6). */
  private[graft] def mm11Pid(v: Long, f: Int): Long =
    if (v < 20) v * 8 + f
    else if (v < 25) { if (f == 4) 400 + v else (v - 20) * 8 + f }
    else (v - 25) * 8 + (7 - f)

  private val histSql: String = (0 until 16)
    .map(j => s"CAST(len(list_filter(string_split(text, ''), c -> unicode(c) % 16 = $j)) AS BIGINT)")
    .mkString("array_to_string([", ", ", "], ',')")

  val oracles: Map[String, String] = Map(
    // mm8: the pattern grid ((id%40)*37 + x*11 + y*23 + 1)*(x*5+y*3+7)
    // % 256 (one perturbed cell for ids >= 40) rebuilt in SQL, dHash
    // bits as per-cell left<right comparisons, Hamming distance as the
    // count of differing bits over all C(50,2) pairs — banding's
    // pigeonhole guarantees the engine finds EXACTLY the <= 8 pairs
    // (the 10 planted near-dups; unrelated pairs sit at >= 9)
    "mm8_phash_dedup" -> """
      WITH ids AS (SELECT unnest(range(50)) AS id),
      ys AS (SELECT unnest(range(8)) AS y),
      xs AS (SELECT unnest(range(9)) AS x),
      g AS (SELECT id, x, y,
              CASE WHEN id >= 40 AND x = 3 AND y = 3
                   THEN (((id % 40)*37 + x*11 + y*23 + 1)*(x*5 + y*3 + 7)
                         % 256 + 128) % 256
                   ELSE ((id % 40)*37 + x*11 + y*23 + 1)*(x*5 + y*3 + 7)
                        % 256 END AS v
            FROM ids CROSS JOIN xs CROSS JOIN ys),
      bits AS (SELECT a.id, a.x, a.y,
                 CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
               FROM g a JOIN g b ON a.id = b.id AND a.y = b.y
                                AND b.x = a.x + 1
               WHERE a.x < 8),
      pairs AS (SELECT pa.id AS media_a, pb.id AS media_b,
                  sum(CASE WHEN pa.bit <> pb.bit THEN 1 ELSE 0 END)
                    AS hamming
                FROM bits pa JOIN bits pb
                  ON pa.x = pb.x AND pa.y = pb.y AND pa.id < pb.id
                GROUP BY 1, 2)
      SELECT CAST(media_a AS BIGINT) AS media_a,
             CAST(media_b AS BIGINT) AS media_b,
             CAST(hamming AS BIGINT) AS hamming
      FROM pairs WHERE hamming <= 8""",

    // mm10: amplitudes ((id%40)*41 + f*13 + 3)*(f*7 + 11) % 1000 (+500
    // mod 1000 at frame 20 for ids >= 40) rebuilt in SQL; a constant
    // frame's energy is 64*amp, so each fingerprint bit is amp(f+1) >
    // amp(f) and Hamming distance counts differing bits per pair
    // mm11: distinct pattern ids <=> distinct frame dHashes (fixture
    // property, simulated separation min Hamming 6), so ordered
    // window-2 shingle equality replays as (pid_f, pid_f+1) tuple
    // equality — the oracle never needs the hash values themselves
    "mm11_video_near_dup" -> """
      WITH v AS (SELECT unnest(range(30)) AS vid),
      f AS (SELECT unnest(range(8)) AS fi),
      pf AS (SELECT vid, fi,
               CASE WHEN vid < 20 THEN vid * 8 + fi
                    WHEN vid < 25 THEN
                      CASE WHEN fi = 4 THEN 400 + vid
                           ELSE (vid - 20) * 8 + fi END
                    ELSE (vid - 25) * 8 + (7 - fi) END AS pid
             FROM v CROSS JOIN f),
      sh AS (SELECT a.vid, a.pid AS p1, b.pid AS p2
             FROM pf a JOIN pf b ON a.vid = b.vid AND b.fi = a.fi + 1),
      n AS (SELECT vid, count(*) AS n_sh FROM sh GROUP BY 1),
      pairs AS (SELECT s1.vid AS video_a, s2.vid AS video_b,
                       count(*) AS common
                FROM sh s1 JOIN sh s2
                  ON s1.p1 = s2.p1 AND s1.p2 = s2.p2 AND s1.vid < s2.vid
                GROUP BY 1, 2)
      SELECT p.video_a, p.video_b,
             round(CAST(p.common AS DOUBLE)
                   / CAST(na.n_sh + nb.n_sh - p.common AS DOUBLE), 6)
               AS jaccard
      FROM pairs p
      JOIN n na ON na.vid = p.video_a
      JOIN n nb ON nb.vid = p.video_b
      WHERE CAST(p.common AS DOUBLE)
            / CAST(na.n_sh + nb.n_sh - p.common AS DOUBLE) >= 0.5""",

    "mm10_audio_fingerprint" -> """
      WITH ids AS (SELECT unnest(range(50)) AS id),
      fs AS (SELECT unnest(range(65)) AS f),
      a AS (SELECT id, f,
              CASE WHEN id >= 40 AND f = 20
                   THEN (((id % 40)*41 + f*13 + 3)*(f*7 + 11)
                         % 1000 + 500) % 1000
                   ELSE ((id % 40)*41 + f*13 + 3)*(f*7 + 11) % 1000
              END AS amp
            FROM ids CROSS JOIN fs),
      bits AS (SELECT x.id, x.f,
                 CASE WHEN y.amp > x.amp THEN 1 ELSE 0 END AS bit
               FROM a x JOIN a y ON x.id = y.id AND y.f = x.f + 1
               WHERE x.f < 64),
      pairs AS (SELECT pa.id AS media_a, pb.id AS media_b,
                  sum(CASE WHEN pa.bit <> pb.bit THEN 1 ELSE 0 END)
                    AS hamming
                FROM bits pa JOIN bits pb
                  ON pa.f = pb.f AND pa.id < pb.id
                GROUP BY 1, 2)
      SELECT CAST(media_a AS BIGINT) AS media_a,
             CAST(media_b AS BIGINT) AS media_b,
             CAST(hamming AS BIGINT) AS hamming
      FROM pairs WHERE hamming <= 8""",

    // mm9: the mm8 grid over 60 ids with BOTH perturbation cells; the
    // pair list is exactly the 10 triangles, so comp(id) reduces to
    // least(id, min(neighbor)) — every triangle member touches the min
    "mm9_phash_components" -> """
      WITH ids AS (SELECT unnest(range(60)) AS id),
      ys AS (SELECT unnest(range(8)) AS y),
      xs AS (SELECT unnest(range(9)) AS x),
      g AS (SELECT id, x, y,
              CASE WHEN id >= 40 AND id < 50 AND x = 3 AND y = 3
                   THEN (((CASE WHEN id >= 40 THEN id % 10 ELSE id END)*37
                          + x*11 + y*23 + 1)*(x*5 + y*3 + 7)
                         % 256 + 128) % 256
                   WHEN id >= 50 AND x = 6 AND y = 5
                   THEN (((CASE WHEN id >= 40 THEN id % 10 ELSE id END)*37
                          + x*11 + y*23 + 1)*(x*5 + y*3 + 7)
                         % 256 + 128) % 256
                   ELSE ((CASE WHEN id >= 40 THEN id % 10 ELSE id END)*37
                         + x*11 + y*23 + 1)*(x*5 + y*3 + 7) % 256
              END AS v
            FROM ids CROSS JOIN xs CROSS JOIN ys),
      bits AS (SELECT a.id, a.x, a.y,
                 CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
               FROM g a JOIN g b ON a.id = b.id AND a.y = b.y
                                AND b.x = a.x + 1
               WHERE a.x < 8),
      pairs AS (SELECT pa.id AS a, pb.id AS b,
                  sum(CASE WHEN pa.bit <> pb.bit THEN 1 ELSE 0 END) AS h
                FROM bits pa JOIN bits pb
                  ON pa.x = pb.x AND pa.y = pb.y AND pa.id < pb.id
                GROUP BY 1, 2),
      near AS (SELECT a, b FROM pairs WHERE h <= 8),
      und AS (SELECT a, b FROM near UNION ALL SELECT b, a FROM near),
      comp AS (SELECT ids.id,
                 least(ids.id, coalesce(min(und.b), ids.id)) AS comp
               FROM ids LEFT JOIN und ON und.a = ids.id
               GROUP BY ids.id)
      SELECT CAST(id AS BIGINT) AS media_id, CAST(comp AS BIGINT) AS comp,
             id = comp AS is_canonical
      FROM comp""",

    "mm5_real_decode" -> """
      SELECT CAST(i AS BIGINT) AS media_id, 'png' AS format,
             CAST(8 AS INT) AS width, CAST(6 AS INT) AS height,
             CAST(i * 7 % 256 AS DOUBLE) AS mean_r,
             CAST(i * 13 % 256 AS DOUBLE) AS mean_g,
             CAST(i * 29 % 256 AS DOUBLE) AS mean_b
      FROM range(50) t(i)""",

    "mm7_exif" -> """
      SELECT CAST(i AS BIGINT) AS media_id,
             CAST(i % 8 + 1 AS INT) AS orientation,
             CAST(100 + i AS INT) AS pixel_x,
             CAST(80 + i AS INT) AS pixel_y,
             'Cam' || (i % 5) AS make,
             '2026:08:14 07:00:' || lpad(CAST(i % 60 AS VARCHAR), 2, '0')
               AS date_time
      FROM range(40) t(i)""",

    "mm6_video_meta" -> """
      SELECT CAST(i AS BIGINT) AS media_id, 'isom' AS brand,
             CAST((i + 1) * 250 AS BIGINT) AS duration_ms,
             CAST(CASE WHEN i % 2 = 0 THEN 2 ELSE 1 END AS INT) AS n_tracks,
             CAST(16 * (i % 9 + 1) AS INT) AS width,
             CAST(9 * (i % 9 + 1) AS INT) AS height,
             true AS has_video,
             i % 2 = 0 AS has_audio
      FROM range(40) t(i)""",

    "mm1_media_schema" -> """
      SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
             'image' AS modality,
             CAST(length(text) % 640 AS INT) AS width,
             CAST(length(text) % 480 AS INT) AS height,
             CAST(length(text) % 30 + 1 AS INT) AS frames
      FROM documents""",

    "mm2_feature_extract" -> s"""
      SELECT doc_id AS media_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             $histSql AS features
      FROM documents""",

    "mm3_frame_sample" -> """
      WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS n,
                        length(text) % 30 + 1 AS frames
                 FROM documents),
      f AS (SELECT media_id, n, frames, unnest(range(0, frames, 5)) AS frame_idx FROM m)
      SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
             CAST(n // frames AS INT) AS frame_len
      FROM f""",

    "mm4_resize" -> """
      SELECT doc_id AS media_id,
             least(octet_length(encode(text)), 192) AS n_bytes,
             CAST(16 AS INT) AS width, CAST(12 AS INT) AS height,
             CAST(length(text) % 30 + 1 AS INT) AS frames
      FROM documents""")
}
