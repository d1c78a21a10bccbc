package graft

/** Resolves the reference golden-fixture directory (the sf0.01 parquet
  * dumps minted by scripts/gen_bt_goldens.py). Priority:
  * `-Dgraft.goldens.dir`, then `$GRAFT_GOLDENS_DIR`, then
  * `src/test/resources/goldens/sf0.01` relative to the working directory
  * (the repo root under sbt) — so a relocated checkout or CI workspace
  * works without source edits.
  */
object Goldens {
  lazy val dir: String =
    sys.props.get("graft.goldens.dir")
      .orElse(sys.env.get("GRAFT_GOLDENS_DIR"))
      .getOrElse(new java.io.File(
        "src/test/resources/goldens/sf0.01").getAbsolutePath)
}
