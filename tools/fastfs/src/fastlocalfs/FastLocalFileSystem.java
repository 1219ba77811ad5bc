package fastlocalfs;

import org.apache.hadoop.fs.LocalFileSystem;

/**
 * Drop-in replacement for {@code fs.file.impl}: the standard checksummed
 * LocalFileSystem over {@link NioRawLocalFileSystem} -- identical
 * semantics (checksums, .crc shadows, atomic rename behavior), minus the
 * one-fork-per-created-file {@code chmod} exec.
 */
public class FastLocalFileSystem extends LocalFileSystem {
  public FastLocalFileSystem() {
    super(new NioRawLocalFileSystem());
  }
}
