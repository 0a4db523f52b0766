package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.Config._

/** Resolution-chain tests mirroring the reference's config suite
  * (/root/reference/src/config/mod.rs:332-358, sources.rs:113-123,
  * env_overrides.rs behavior): defaults, backend parsing, file layering,
  * env-override priority, validation failures. */
class ConfigSpec extends AnyFunSuite {

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft-config").toFile
    d.deleteOnExit(); d
  }

  test("defaults match the reference's platform defaults") {
    val c = Config.load(Map.empty, tmpDir())
    assert(c.batch.maxRows == 200000L)
    assert(c.batch.maxBytes == 128L * 1024 * 1024)
    assert(c.batch.maxAgeSecs == 10L)
    assert(c.batch.enabled)
    assert(c.request.maxPayloadBytes == 8L * 1024 * 1024)
    assert(c.writer.maxRecordsPerFile == 200000L)
    assert(c.writer.triggerIntervalSecs == 10L)
    assert(c.storage.backend == "fs")
    assert(c.storage.path == "./data")
    assert(c.outputRoot == "./data")
  }

  test("storage backend parses with the reference's aliases") {
    assert(normalizeBackend("fs") == "fs")
    assert(normalizeBackend("filesystem") == "fs")
    assert(normalizeBackend("s3") == "s3")
    assert(normalizeBackend("aws") == "s3")
    assert(normalizeBackend("R2") == "r2")
    val e = intercept[IllegalArgumentException](normalizeBackend("gcs"))
    assert(e.getMessage.contains("unsupported storage backend"))
  }

  test("inline config content layers over defaults; absent keys keep defaults") {
    val toml =
      """# sample
        |[batch]
        |max_rows = 5_000   # trailing comment
        |
        |[storage]
        |backend = "s3"
        |[storage.s3]
        |bucket = "telemetry"
        |region = "us-east-1"
        |prefix = "otel"
        |""".stripMargin
    val c = Config.load(Map(s"${EnvPrefix}CONFIG_CONTENT" -> toml), tmpDir())
    assert(c.batch.maxRows == 5000L)
    assert(c.batch.maxBytes == 128L * 1024 * 1024, "absent key keeps default")
    assert(c.storage.backend == "s3")
    assert(c.storage.s3.bucket == "telemetry")
    assert(c.storage.s3.prefix.contains("otel/"), "prefix gets trailing slash")
    assert(c.outputRoot == "s3a://telemetry/otel")
  }

  test("env overrides beat the file layer (reference priority order)") {
    val toml = "[batch]\nmax_rows = 5000\nmax_age_secs = 99\n"
    val env = Map(
      s"${EnvPrefix}CONFIG_CONTENT" -> toml,
      s"${EnvPrefix}BATCH_MAX_ROWS" -> "77")
    val c = Config.load(env, tmpDir())
    assert(c.batch.maxRows == 77L, "env wins over file")
    assert(c.batch.maxAgeSecs == 99L, "file wins over default")
  }

  test("stream_elide_flush knob: default true, file layer and env override") {
    assert(Config.load(Map.empty, tmpDir()).writer.streamElideFlush)
    val toml = "[writer]\nstream_elide_flush = false\n"
    val viaFile = Config.load(
      Map(s"${EnvPrefix}CONFIG_CONTENT" -> toml), tmpDir())
    assert(!viaFile.writer.streamElideFlush, "file layer sets it")
    val viaEnv = Config.load(
      Map(s"${EnvPrefix}CONFIG_CONTENT" -> toml,
        s"${EnvPrefix}STREAM_ELIDE_FLUSH" -> "true"), tmpDir())
    assert(viaEnv.writer.streamElideFlush, "env wins over file")
  }

  test("GRAFT_CONFIG file wins over inline content; missing file is a hard error") {
    val dir = tmpDir()
    val f = new java.io.File(dir, "explicit.toml")
    java.nio.file.Files.write(f.toPath, "[batch]\nmax_rows = 123\n".getBytes)
    val c = Config.load(Map(
      s"${EnvPrefix}CONFIG" -> f.getPath,
      s"${EnvPrefix}CONFIG_CONTENT" -> "[batch]\nmax_rows = 456\n"), dir)
    assert(c.batch.maxRows == 123L)
    val e = intercept[IllegalArgumentException] {
      Config.load(Map(s"${EnvPrefix}CONFIG" -> new java.io.File(dir, "nope.toml").getPath), dir)
    }
    assert(e.getMessage.contains("config file not readable"))
  }

  test("default config files are discovered in the working directory") {
    val dir = tmpDir()
    java.nio.file.Files.write(new java.io.File(dir, "config.toml").toPath,
      "[writer]\nmax_records_per_file = 42\n".getBytes)
    val c = Config.load(Map.empty, dir)
    assert(c.writer.maxRecordsPerFile == 42L)
    // hidden fallback is used only when config.toml is absent
    val dir2 = tmpDir()
    java.nio.file.Files.write(new java.io.File(dir2, ".graft.toml").toPath,
      "[writer]\nmax_records_per_file = 43\n".getBytes)
    assert(Config.load(Map.empty, dir2).writer.maxRecordsPerFile == 43L)
  }

  test("legacy BATCHING_ENABLED alias honored; canonical BATCH_ENABLED wins") {
    val base = Map.empty[String, String]
    assert(!Config.load(base + (s"${EnvPrefix}BATCHING_ENABLED" -> "false"), tmpDir())
      .batch.enabled)
    val both = base +
      (s"${EnvPrefix}BATCHING_ENABLED" -> "false") +
      (s"${EnvPrefix}BATCH_ENABLED" -> "true")
    assert(Config.load(both, tmpDir()).batch.enabled)
  }

  test("r2 backend: AWS standard credentials read unprefixed; endpoint derived") {
    val env = Map(
      s"${EnvPrefix}STORAGE_BACKEND" -> "r2",
      s"${EnvPrefix}R2_BUCKET" -> "bkt",
      s"${EnvPrefix}R2_ACCOUNT_ID" -> "acct42",
      "AWS_ACCESS_KEY_ID" -> "ak",
      "AWS_SECRET_ACCESS_KEY" -> "sk")
    val c = Config.load(env, tmpDir())
    assert(c.storage.r2.accessKeyId == "ak")
    assert(c.storage.r2.secretAccessKey == "sk")
    assert(c.outputRoot == "s3a://bkt")
  }

  test("validation: the reference's must-be-positive and required-field rules") {
    val zeroRows = intercept[IllegalArgumentException] {
      Config.load(Map(s"${EnvPrefix}BATCH_MAX_ROWS" -> "0"), tmpDir())
    }
    assert(zeroRows.getMessage.contains("batch.max_rows"))
    val s3NoBucket = intercept[IllegalArgumentException] {
      Config.load(Map(s"${EnvPrefix}STORAGE_BACKEND" -> "s3"), tmpDir())
    }
    assert(s3NoBucket.getMessage.contains("storage.s3.bucket"))
    val badInt = intercept[IllegalArgumentException] {
      Config.load(Map(s"${EnvPrefix}MAX_PAYLOAD_BYTES" -> "huge"), tmpDir())
    }
    assert(badInt.getMessage.contains(s"${EnvPrefix}MAX_PAYLOAD_BYTES"),
      "parse error names the offending variable")
  }

  test("typo'd config keys and out-of-range int knobs fail loudly") {
    val typo = intercept[IllegalArgumentException] {
      Config.load(Map(s"${EnvPrefix}CONFIG_CONTENT" -> "[batch]\nmax_rowss = 5\n"), tmpDir())
    }
    assert(typo.getMessage.contains("unknown config keys"))
    assert(typo.getMessage.contains("batch.max_rowss"))
    val wide = intercept[IllegalArgumentException] {
      Config.load(Map(s"${EnvPrefix}MAX_FILES_PER_TRIGGER" -> "4294967297"), tmpDir())
    }
    assert(wide.getMessage.contains("32-bit range"),
      "4294967297 must not silently wrap to 1")
  }

  test("s3 credentials come from the injected env map, not the process env") {
    val c = Config.load(Map(
      s"${EnvPrefix}STORAGE_BACKEND" -> "s3",
      s"${EnvPrefix}S3_BUCKET" -> "bkt",
      s"${EnvPrefix}S3_REGION" -> "us-east-1",
      "AWS_ACCESS_KEY_ID" -> "injected-key",
      "AWS_SECRET_ACCESS_KEY" -> "injected-secret"), tmpDir())
    assert(c.storage.s3.accessKeyId == "injected-key")
    assert(c.storage.s3.secretAccessKey == "injected-secret")
  }

  test("toml subset parser: loud errors on unsupported syntax") {
    val arr = intercept[IllegalArgumentException] {
      Config.parseToml("key = [1, 2]\n", "test")
    }
    assert(arr.getMessage.contains("unsupported value"))
    val noEq = intercept[IllegalArgumentException] {
      Config.parseToml("just a line\n", "test")
    }
    assert(noEq.getMessage.contains("expected key = value"))
  }

  test("toml strings: embedded quotes and backslashes fail loudly") {
    // `"a" junk "` starts and ends with a quote — must NOT parse as `a" junk `
    val emb = intercept[IllegalArgumentException] {
      Config.parseToml("key = \"a\" junk \"\n", "test")
    }
    assert(emb.getMessage.contains("embedded quote"))
    val esc = intercept[IllegalArgumentException] {
      Config.parseToml("key = \"a\\\\b\"\n", "test")
    }
    assert(esc.getMessage.contains("backslash"))
    // plain strings still parse
    assert(Config.parseToml("key = \"plain value\"\n", "test")("key") == "plain value")
  }

  test("generic PREFIX wins over S3_PREFIX, like the reference") {
    val c = Config.load(Map(
      s"${EnvPrefix}STORAGE_BACKEND" -> "s3",
      s"${EnvPrefix}S3_BUCKET" -> "bkt",
      s"${EnvPrefix}S3_REGION" -> "us-east-1",
      s"${EnvPrefix}S3_PREFIX" -> "specific",
      s"${EnvPrefix}PREFIX" -> "generic"), tmpDir())
    // env_overrides.rs applies PREFIX after S3_PREFIX → PREFIX wins
    // (normalizePrefix appends the trailing slash)
    assert(c.storage.s3.prefix.contains("generic/"))
  }
}
