package fastlocalfs;

import java.io.IOException;
import java.nio.file.Files;
import java.nio.file.attribute.PosixFilePermission;
import java.util.EnumSet;
import java.util.Set;

import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * RawLocalFileSystem whose {@code setPermission} uses
 * {@link Files#setPosixFilePermissions} instead of forking {@code chmod}.
 *
 * Without libhadoop.so (NativeIO unavailable -- the common case in a
 * container without the native package), Hadoop's RawLocalFileSystem
 * shells out one {@code chmod} per created file or directory. Every
 * Spark checkpoint file, state-store delta, shuffle file and task
 * attempt directory pays a posix_spawn of the whole JVM (measured
 * ~600 forks per streaming micro-batch entry; guide's "per-task work"
 * tier). java.nio has provided the equivalent syscall since JDK 7.
 *
 * Semantics kept identical to the shell path: the low 9 permission
 * bits are applied; sticky/setuid bits (inexpressible via
 * PosixFilePermission, and never requested by Spark's local-mode
 * writers) fall back to the parent implementation.
 */
public class NioRawLocalFileSystem extends RawLocalFileSystem {

  private static final PosixFilePermission[] BITS = {
    PosixFilePermission.OTHERS_EXECUTE, PosixFilePermission.OTHERS_WRITE,
    PosixFilePermission.OTHERS_READ,
    PosixFilePermission.GROUP_EXECUTE, PosixFilePermission.GROUP_WRITE,
    PosixFilePermission.GROUP_READ,
    PosixFilePermission.OWNER_EXECUTE, PosixFilePermission.OWNER_WRITE,
    PosixFilePermission.OWNER_READ,
  };

  static Set<PosixFilePermission> toNio(int mode) {
    EnumSet<PosixFilePermission> out = EnumSet.noneOf(PosixFilePermission.class);
    for (int i = 0; i < 9; i++) {
      if (((mode >> i) & 1) == 1) {
        out.add(BITS[i]);
      }
    }
    return out;
  }

  @Override
  public void setPermission(Path p, FsPermission permission) throws IOException {
    if (permission == null) {
      return;
    }
    int mode = permission.toShort();
    if ((mode & ~0777) != 0) {
      super.setPermission(p, permission); // sticky/setuid: keep exact behavior
      return;
    }
    Files.setPosixFilePermissions(pathToFile(p).toPath(), toNio(mode));
  }
}
